"""Head-packed Pallas attention for short ViT sequences.

Why: per-(batch, head) attention matmuls at ViT-B shapes ([197, 64] x
[64, 197]) under-utilize the MXU (K=64 -> half the systolic array idle, plus
per-matmul setup), which is why naive Pallas kernels lose to XLA here
(BENCH.md).  This kernel packs G=4 heads into ONE matmul pair per group using
block-diagonal operands:

  scores[:, 256g:256(g+1)] for head h=4g+i comes from
      q_group [N, G*D] @ K_bd [G*D, G*N],  K_bd block-diagonal with k_h^T
  output likewise via P [N, G*N] @ V_bd [G*N, G*D], V_bd block-diagonal.

Contractions become K=256 with clean [256, 256] x [256, 1024] tiles — full
MXU utilization at a 4x FLOP overhead (zeros), still ~6x less wasteful than
the K=64 path.  qkv stays in its natural [N, 3C] matmul-output layout: no
XLA-level transposes in or out; softmax lives in VMEM.

Layout contract: qkv [B, N, 3C] (fused projection output), N padded to 256
by the wrapper; returns [B, N, C] token-major attention output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 4          # heads per packed group
NP = 256       # padded sequence length


def _kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, valid_n: int,
            scale: float):
    C = num_heads * head_dim
    gd = G * head_dim                    # 256 with D=64
    gn = G * NP                          # 1024

    col_in_block = jax.lax.broadcasted_iota(jnp.int32, (NP, gn), 1) % NP
    key_valid = col_in_block < valid_n   # mask padded keys per 256-block

    def block_diag(cols_base: int) -> jax.Array:
        """[G*NP, G*D] block-diagonal from per-head [NP, D] slices (static
        concatenation — Mosaic has no value dynamic_update_slice)."""
        bands = []
        for i in range(G):
            h = block_diag.g * G + i
            x_h = qkv_ref[0][:, cols_base + h * head_dim:
                             cols_base + (h + 1) * head_dim].astype(jnp.bfloat16)
            parts = []
            if i:
                parts.append(jnp.zeros((NP, i * head_dim), jnp.bfloat16))
            parts.append(x_h)
            if i < G - 1:
                parts.append(jnp.zeros((NP, (G - 1 - i) * head_dim),
                                       jnp.bfloat16))
            bands.append(jnp.concatenate(parts, axis=1) if len(parts) > 1
                         else parts[0])
        return jnp.concatenate(bands, axis=0)

    for g in range(num_heads // G):
        block_diag.g = g
        q_g = qkv_ref[0][:, g * gd:(g + 1) * gd].astype(jnp.bfloat16)  # [NP, gd]
        k_bd = block_diag(C)          # [gn, gd]
        v_bd = block_diag(2 * C)      # [gn, gd]

        # s[:, block i] = q_hi @ k_hi^T via contraction over gd — no transpose
        s = jax.lax.dot_general(q_g, k_bd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_valid, s, -jnp.inf)                  # [NP, gn]
        # per-256-block softmax without reshapes: segment max/sum via the
        # block structure — reshape is free in VMEM row-major here
        s4 = s.reshape(NP, G, NP)
        m = jnp.max(s4, axis=-1, keepdims=True)
        p = jnp.exp(s4 - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).reshape(NP, gn).astype(jnp.bfloat16)

        out_g = jnp.dot(p, v_bd, preferred_element_type=jnp.float32)
        o_ref[0, :, g * gd:(g + 1) * gd] = out_g.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def packed_attention(qkv: jax.Array, *, num_heads: int,
                     interpret: bool = False) -> jax.Array:
    """qkv: [B, N, 3C] fused-projection output -> [B, N, C] attention out.

    Requires C % (G*head_dim) == 0 (i.e. num_heads divisible by 4) and
    N <= 256.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    head_dim = C // num_heads
    assert num_heads % G == 0, "num_heads must be divisible by 4"
    assert N <= NP
    pad_n = NP - N
    if pad_n:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad_n), (0, 0)))
    scale = head_dim ** -0.5

    in_spec = pl.BlockSpec((1, NP, C3), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, NP, C), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=head_dim,
                          valid_n=N, scale=scale),
        grid=(B,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, NP, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * (num_heads // G) * NP * (G * head_dim) * (G * NP),
            bytes_accessed=B * NP * (3 * C + C) * 2,
            transcendentals=B * num_heads * NP * NP),
        interpret=interpret,
    )(qkv)
    return out[:, :N] if pad_n else out


def packed_attention_reference(qkv: jax.Array, num_heads: int) -> jax.Array:
    """jnp oracle."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    q = qkv[..., :C].reshape(B, N, num_heads, hd)
    k = qkv[..., C:2 * C].reshape(B, N, num_heads, hd)
    v = qkv[..., 2 * C:].reshape(B, N, num_heads, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32) * hd ** -0.5,
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))
    return o.reshape(B, N, C).astype(qkv.dtype)
