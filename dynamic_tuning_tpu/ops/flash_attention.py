"""Pallas fused attention kernel for short ViT sequences.

Profiling on v5e (scripts/profile_breakdown.py) shows attention is ~70% of
the DyT ViT-B forward and the materialized fp32 softmax alone ~39% — the
[B, H, 197, 197] score tensor round-trips HBM multiple times in the stock XLA
lowering.  ViT sequences (197-1577 tokens) fit entirely in VMEM, so this
kernel computes scores -> softmax -> weighted sum per (batch, head) block
without ever writing scores to HBM.  No online-softmax tiling is needed at
these lengths — it's a single-tile flash attention.

Layout: q, k, v are [B, H, N, D] (D = head_dim).  Sequence is padded to a
lane multiple by the wrapper; padded key columns are masked to -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_n: int):
    q = q_ref[0].astype(jnp.bfloat16)           # [H, N, D]
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    n = q.shape[1]

    # batched over heads: one program per batch element keeps program count
    # low (grid=B); Mosaic unrolls the H batch dim over the MXU
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if valid_n < n:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < valid_n, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(jnp.bfloat16)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _kernel_per_head(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                     valid_n: int, has_bias: bool):
    """Long-sequence variant: one (batch, head) per program so the [N, N]
    fp32 score tile fits VMEM (N up to ~2k); optional additive bias
    (relative-position bias, shared over batch)."""
    q = q_ref[0, 0].astype(jnp.bfloat16)        # [N, D]
    k = k_ref[0, 0].astype(jnp.bfloat16)
    v = v_ref[0, 0].astype(jnp.bfloat16)
    n = q.shape[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if valid_n < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_n, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(jnp.bfloat16)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias=None, *, interpret: bool = False) -> jax.Array:
    """Fused softmax(q k^T / sqrt(d) + bias) v.

    q, k, v: [B, H, N, D] (any float dtype); optional additive ``bias``
    [H, N, N] (e.g. relative-position bias, shared over batch — never
    materialized at [B, H, N, N]).  Returns [B, H, N, D] in the input dtype.
    The full [N, N] score tile lives in VMEM (fp32), so N is limited to ~2k —
    plenty for ViT (197), video pooling (1577) and seg (1025).

    Short sequences (N <= 256) use a heads-batched grid (one program per
    batch element); longer ones use one program per (batch, head).
    """
    B, H, N, D = q.shape
    pad_n = (-N) % 128
    if pad_n:
        padding = ((0, 0), (0, 0), (0, pad_n), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n)))
    Np = N + pad_n
    scale = D ** -0.5

    if Np <= 256 and bias is None:
        spec = pl.BlockSpec((1, H, Np, D), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, valid_n=N),
            grid=(B,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * Np * Np * D,
                bytes_accessed=4 * B * H * Np * D * 2,
                transcendentals=B * H * Np * Np),
            interpret=interpret,
        )(q, k, v)
        return out[:, :, :N] if pad_n else out

    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((H, 1, 1), jnp.float32)   # dummy operand
    qkv_spec = pl.BlockSpec((1, 1, Np, D), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1,) + bias.shape[1:], lambda b, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_per_head, scale=scale, valid_n=N,
                          has_bias=has_bias),
        grid=(B, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Np * Np * D,
            bytes_accessed=4 * B * H * Np * D * 2 + H * Np * Np * 4,
            transcendentals=B * H * Np * Np),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :, :N] if pad_n else out


def attention_reference(q, k, v, bias=None):
    """jnp oracle (fp32 softmax, optional [H, N, N] bias)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)
