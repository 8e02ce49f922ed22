"""Serving-path fused multi-head attention (Pallas, TPU).

The eval/serving attention core — scores -> softmax -> AV — is HBM-bound
under XLA: the [B, H, N, N] score tensor is materialized between the two
matmuls (~480 MB round-trip per ViT-B block at batch 128), because XLA
cannot fuse through a matmul.  This kernel keeps the whole per-(batch, head)
score tile in VMEM: per grid step it loads q/k/v for ALL heads of one batch
sample (~0.9 MB), computes every head's scores, softmax and AV on-chip, and
writes only the [H, N, hd] output.  HBM traffic drops from ~600 MB to
~155 MB per block.

Numerics match the XLA serving branch in models/layers.py exactly: clamped
no-max softmax (exp(clip(s, -60, 80) - 20), exact to fp32 resolution for row
max in [-60, 80]) with normalization deferred past the AV matmul, fp32
scores/accumulation, bf16 weights into the AV matmul.

Replaces the reference's F.scaled_dot_product_attention serving call
(/root/reference/models/vision_transformer_IN21K.py:60-64) on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One batch sample, all heads.  Blocks: [1, H, N, hd]."""
    H = q_ref.shape[1]
    for h in range(H):
        q = q_ref[0, h]                                   # [N, hd] bf16
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q * scale, k,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(q.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_serving(q: jax.Array, k: jax.Array, v: jax.Array, *,
                interpret: bool = False) -> jax.Array:
    """[B, H, N, hd] x3 -> [B, H, N, hd]; deterministic (no dropout) path.

    Grid over B; Pallas double-buffers the per-sample qkv DMA against the
    previous sample's compute automatically.
    """
    B, H, N, hd = q.shape
    scale = hd ** -0.5
    spec = pl.BlockSpec((1, H, N, hd), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    flops = 2 * 2 * B * H * N * N * hd
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, N, hd), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * H * N * N,
            bytes_accessed=4 * B * H * N * hd * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v)


def mha_serving_reference(q, k, v):
    """The XLA lowering this kernel replaces (models/layers.py serving
    branch) — used for parity tests and as the non-TPU fallback."""
    hd = q.shape[-1]
    s = jax.lax.dot_general(q * (hd ** -0.5), k,
                            (((3,), (3,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(q.dtype)
    o = jax.lax.dot_general(p, v, (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    return (o / l).astype(q.dtype)


# --- fused layout-free kernel -------------------------------------------------
#
# The version above still pays XLA's layout taxes around it: the [B,N,3C] qkv
# projection output must be transposed to [3,B,H,N,hd] before the core and the
# [B,H,N,hd] result transposed back — two full HBM round-trips of the
# activation tensor.  This kernel consumes the RAW fused-qkv layout and emits
# the [B,N,C] layout the output projection wants, so the attention sublayer
# becomes  Dense(qkv) -> kernel -> Dense(proj)  with zero relayouts.
#
# Head-pair tiling: with hd=64, single-head tiles [N,64] waste half of every
# 128-wide VPU/MXU lane vector.  Heads 2p and 2p+1 occupy one 128-lane-aligned
# slice of the qkv buffer, so each pair is processed as one [N,128] tile:
#   q0 = qp masked to lanes <64, q1 = qp - q0
#   s_h = (q_h * scale) @ kp^T        (K=128, half zeros == padded K=64, but
#                                      the tile comes straight from the fused
#                                      buffer with no relayout)
#   p_h = exp(clip(s_h)-20)           (the serving no-max softmax, fp32)
#   o   = select(lane<64, p0 @ vp, p1 @ vp) * reciprocal(l)
# Everything stays in VMEM between the two matmuls — the [N,N] score tile
# never touches HBM (XLA materializes it: ~240 MB/block round-trip at B=128).


def _mha_fused_kernel(qkv_ref, o_ref, *, heads: int, hd: int, scale: float,
                      group: int):
    """One batch sample.  Heads are processed ``group`` at a time as ONE pair
    of matmuls via block-diagonal row-stacking:

      lhs [g*N, g*hd]  row block j = q of head j, masked to its own lane band
      s   = lhs @ k_grp^T   -> [g*N, N]   every row valid (block-diag zeros
                                           kill the cross-head lane products)
      o   = softmax(s) @ v_grp -> [g*N, g*hd]; head j's output sits at
            (row block j, lane band j) -- assembled with g masked adds.

    The g x flop inflation is deliberate: per-matmul MXU issue overhead
    (~0.5 us) dominates at [197, 64]-sized operands, so fewer/bigger matmuls
    win even at g x the arithmetic (measured: group=2 -> 24 matmuls/sample
    1.75 ms; see scripts/profile_mha_variants.py)."""
    N = qkv_ref.shape[1]
    C = heads * hd
    G = group * hd                                      # lanes per group
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, G), 1)
    bands = [jnp.logical_and(lane >= j * hd, lane < (j + 1) * hd)
             for j in range(group)]
    for i in range(heads // group):
        q_grp = qkv_ref[0, :, G * i: G * (i + 1)]
        k_grp = qkv_ref[0, :, C + G * i: C + G * (i + 1)]
        v_grp = qkv_ref[0, :, 2 * C + G * i: 2 * C + G * (i + 1)]
        q_grp = (q_grp.astype(jnp.float32) * scale).astype(q_grp.dtype)
        lhs = jnp.concatenate(
            [jnp.where(bands[j], q_grp, jnp.zeros_like(q_grp))
             for j in range(group)], axis=0)            # [g*N, G]
        s = jax.lax.dot_general(lhs, k_grp, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)    # [g*N, N] fp32
        l = jnp.sum(p, axis=-1, keepdims=True)          # [g*N, 1]
        o_all = jax.lax.dot_general(p.astype(q_grp.dtype), v_grp,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_all = o_all * (1.0 / l)                       # [g*N, G]
        out = jnp.where(bands[0], o_all[0:N], 0.0)
        for j in range(1, group):
            out = out + jnp.where(bands[j], o_all[j * N:(j + 1) * N], 0.0)
        o_ref[0, :, G * i: G * (i + 1)] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "group", "interpret"))
def mha_serving_fused(qkv: jax.Array, *, heads: int, group: int = 2,
                      interpret: bool = False) -> jax.Array:
    """Fused serving attention: [B, N, 3C] raw qkv -> [B, N, C].

    Consumes the fused qkv projection output directly and emits the layout the
    output projection wants — no XLA transposes anywhere (they cost more than
    the attention math itself: see scripts/profile_mha_fused.py).
    ``group`` heads share each matmul pair (block-diag row stacking).
    Requires group | heads and (group*hd) % 128 == 0 for lane alignment.
    Deterministic path only (no dropout).  Numerics identical to
    ``mha_serving_reference``.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    assert heads % group == 0 and hd * heads == C, (heads, group, C)
    assert (group * hd) % 128 == 0, (group, hd)
    scale = hd ** -0.5
    flops = 2 * 2 * B * heads * N * N * group * hd
    return pl.pallas_call(
        functools.partial(_mha_fused_kernel, heads=heads, hd=hd, scale=scale,
                          group=group),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C3), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=qkv.size * qkv.dtype.itemsize
            + B * N * C * qkv.dtype.itemsize),
        interpret=interpret,
    )(qkv)


def mha_fused_reference(qkv: jax.Array, *, heads: int) -> jax.Array:
    """XLA path the fused kernel replaces: transpose -> core -> transpose."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    q, k, v = (qkv.reshape(B, N, 3, heads, hd).transpose(2, 0, 3, 1, 4))
    o = mha_serving_reference(q, k, v)                  # [B, H, N, hd]
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)
