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
    1.75 ms; see scripts/profile_attention.py)."""
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


# --- SPMD batch partitioning --------------------------------------------------
#
# pallas_call does not auto-partition under pjit: with a batch-sharded input
# XLA inserts all-gathers and replicates the kernel on every device (measured:
# 9 all-gathers and fully-replicated outputs on an 8-way data mesh).  Every
# kernel here is embarrassingly parallel over dim 0 of its first argument, so
# each entry point routes through jax.experimental.custom_partitioning: the
# kernel runs on the local batch shard, weights/bias stay replicated, and the
# outputs inherit the input's batch sharding — no collectives at all.


def _batch_partitioned(impl, arg_ndims, out_ndims):
    """Wrap impl(*arrays): arg0 + all outputs batch-major (sharded on dim 0,
    shared factor "b"), every other dimension an independent factor (weights
    arrive replicated from the runners and stay so).

    Uses a Shardy einsum-like sharding rule plus a partition fn that runs the
    kernel on the local batch shard — without this, pallas_call under pjit
    forces all-gathers and replicated compute."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    cp = custom_partitioning(impl)

    fresh = iter(f"f{i}" for i in range(200))
    ops = []
    for i, nd in enumerate(arg_ndims):
        dims = (["b"] if i == 0 else [next(fresh)])
        dims += [next(fresh) for _ in range(nd - 1)]
        ops.append(" ".join(dims))
    outs = []
    for nd in out_ndims:
        outs.append(" ".join(["b"] + [next(fresh) for _ in range(nd - 1)]))
    rule = ", ".join(ops) + " -> " + ", ".join(outs)

    def _bspec(arg_infos):
        sh = getattr(arg_infos[0], "sharding", None)
        spec = getattr(sh, "spec", None)
        if not spec or len(spec) == 0:
            return None
        return spec[0]

    def partition(mesh, arg_infos, result_infos):
        b = _bspec(arg_infos)
        args = [NamedSharding(mesh, P(b, *([None] * (len(arg_infos[0].shape)
                                                     - 1))))]
        for a in arg_infos[1:]:
            args.append(NamedSharding(mesh, P(*([None] * len(a.shape)))))
        single = not isinstance(result_infos, (list, tuple))
        rs = [result_infos] if single else list(result_infos)
        outs = [NamedSharding(mesh, P(b, *([None] * (len(r.shape) - 1))))
                for r in rs]
        return mesh, impl, (outs[0] if single else tuple(outs)), tuple(args)

    cp.def_partition(partition=partition, sharding_rule=rule)
    return cp


@functools.lru_cache(maxsize=None)
def _fused_partitioned(heads: int, group: int, interpret: bool):
    return _batch_partitioned(
        lambda qkv: _mha_serving_fused_impl(qkv, heads, group, interpret),
        arg_ndims=(3,), out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("heads", "group", "interpret"))
def mha_serving_fused(qkv: jax.Array, *, heads: int, group: int = 2,
                      interpret: bool = False) -> jax.Array:
    """Fused serving attention: [B, N, 3C] raw qkv -> [B, N, C].

    Consumes the fused qkv projection output directly and emits the layout the
    output projection wants — no XLA transposes anywhere (they cost more than
    the attention math itself: see scripts/profile_attention.py).
    ``group`` heads share each matmul pair (block-diag row stacking).
    Requires group | heads and (group*hd) % 128 == 0 for lane alignment.
    Deterministic path only (no dropout).  Numerics identical to
    ``mha_serving_reference``.  SPMD-partitions along the batch sharding.
    """
    return _fused_partitioned(heads, group, interpret)(qkv)


def _mha_serving_fused_impl(qkv, heads, group, interpret):
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


# --- windowed (BEiT/seg) kernel -----------------------------------------------
#
# The segmentation backbone's attention adds a learned relative-position bias
# to the scores (models/seg_vit.py; reference dense_tasks/.../segmentation_
# vision_transformer_IN21K.py:150-195).  At 512^2 inputs N=1025, so the XLA
# path materializes a 50 MB fp32 score tensor per (sample, block) twice.
# This kernel keeps the per-pair score tile in VMEM; the grid is
# (head_pair, batch) with the bias tile's index map independent of batch, so
# Mosaic's revolving buffers keep each pair's bias resident across the whole
# batch — the bias is DMA'd once per pair, not once per sample.


def _mha_windowed_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, hd: int,
                         scale: float):
    """One (pair, row-chunk, sample) grid step.  Rows are chunked so the
    fp32 score tile stays inside the 16 MB scoped-VMEM budget even at
    N=1025 inside a full compiled model (an unchunked [2N, N] tile OOMs
    there; the standalone-kernel profile masked this)."""
    RC = q_ref.shape[1]                                   # rows this chunk
    lane = jax.lax.broadcasted_iota(jnp.int32, (RC, 2 * hd), 1)
    left = lane < hd
    qp = q_ref[0]                                         # [RC, 128]
    kp = k_ref[0]                                         # [N, 128]
    vp = v_ref[0]
    qp = (qp.astype(jnp.float32) * scale).astype(qp.dtype)
    q0 = jnp.where(left, qp, jnp.zeros_like(qp))
    lhs = jnp.concatenate([q0, qp - q0], axis=0)          # [2RC, 128]
    s = jax.lax.dot_general(lhs, kp, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + jnp.concatenate([bias_ref[0, 0], bias_ref[0, 1]],
                            axis=0).astype(jnp.float32)
    e = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o_all = jax.lax.dot_general(e.astype(qp.dtype), vp,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_all = o_all * (1.0 / l)
    out = (jnp.where(left, o_all[0:RC], 0.0)
           + jnp.where(left, 0.0, o_all[RC:2 * RC]))
    o_ref[0] = out.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _windowed_partitioned(heads: int, interpret: bool):
    return _batch_partitioned(
        lambda qkv, bias: _mha_windowed_impl(qkv, bias, heads, interpret),
        arg_ndims=(3, 3), out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def mha_windowed_fused(qkv: jax.Array, bias: jax.Array, *, heads: int,
                       interpret: bool = False) -> jax.Array:
    """Serving attention with additive score bias: [B,N,3C] + [H,N,N] ->
    [B,N,C].  Same head-pair tiling and clamped no-max softmax as
    ``mha_serving_fused``.  The q/k/v pair slices are delivered through
    BlockSpec lane-block index maps (the same qkv array passed three times);
    the bias pair tile's index map ignores batch, so with batch as the inner
    grid dimension each pair's 2N x N bias is DMA'd once, not once per
    sample.  SPMD-partitions along the batch sharding (bias replicated)."""
    return _windowed_partitioned(heads, interpret)(qkv, bias)


def _mha_windowed_impl(qkv, bias, heads, interpret):
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    P = heads // 2
    scale = hd ** -0.5
    # bias rides to the kernel in bf16 (half the HBM traffic of the hottest
    # operand; upcast to fp32 at the score add — the q/k inputs are bf16
    # anyway so the rounding is within the pipeline's noise floor)
    bias_pairs = bias.astype(jnp.bfloat16).reshape(P, 2, N, N)
    # row-chunk size: fp32 score tile 2*RC*N + bf16 bias tile must fit the
    # 16 MB scoped-VMEM budget alongside k/v; 384 rows ~ 6.3 MB at N=1025
    # (bigger chunks = fewer redundant k/v DMAs)
    RC = min(N, 384)
    J = (N + RC - 1) // RC
    flops = 2 * 2 * B * heads * N * N * 2 * hd
    qrow_block = lambda off: pl.BlockSpec(
        (1, RC, 2 * hd), lambda p, j, b, off=off: (b, j, off + p),
        memory_space=pltpu.VMEM)
    kv_block = lambda off: pl.BlockSpec(
        (1, N, 2 * hd), lambda p, j, b, off=off: (b, 0, off + p),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_windowed_kernel, hd=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(P, J, B),
        in_specs=[
            qrow_block(0),                    # q pair lanes, row chunk
            kv_block(P),                      # k pair lanes, all rows
            kv_block(2 * P),                  # v pair lanes, all rows
            pl.BlockSpec((1, 2, RC, N), lambda p, j, b: (p, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RC, 2 * hd), lambda p, j, b: (b, j, p),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=(qkv.size + B * N * C) * qkv.dtype.itemsize
            + bias_pairs.size * 2),
        interpret=interpret,
    )(qkv, qkv, qkv, bias_pairs)
#
# One further fusion level: the ENTIRE pre-norm attention sublayer
#     out = x + proj(attn_core(qkv(LN(x))))
# as one Pallas program per sample with the qkv/proj weights VMEM-resident
# across the grid.  Removes every intermediate HBM tensor of the sublayer:
# the LN output, the [B,N,3C] qkv buffer (232 MB round-trip at bench shapes),
# the core output, and the pre-residual projection — only x is read and
# x+attn written.  Replaces Block's norm1+Attention serving composition
# (reference vision_transformer_IN21K.py:144-150).


def layernorm_f32(xf, gamma, beta):
    """In-kernel LN on a fp32 [N, C] tile (eps matches nn.LayerNorm 1e-6)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + 1e-6) * gamma + beta


def erf_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max err 1.5e-7 — far below
    the bf16 ulp and the int8 noise floor).  Mosaic has no erf/erfc
    lowering; this uses only exp and mul-adds.  Shared by the int8 kernels
    (ops/quant.py) and the fused-MLP experiment (ops/fused_mlp.py)."""
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def attn_core_pairs(qkv_s, out_s, *, heads: int, hd: int, scale: float):
    """The head-pair attention core on a VMEM qkv scratch [N, 3C]; writes
    [N, C] to ``out_s``.  Shared by every fused sublayer kernel (bf16 and
    int8 variants)."""
    N = qkv_s.shape[0]
    C = heads * hd
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * hd), 1)
    left = lane < hd
    for p in range(heads // 2):
        qp = qkv_s[:, 2 * hd * p: 2 * hd * (p + 1)]
        kp = qkv_s[:, C + 2 * hd * p: C + 2 * hd * (p + 1)]
        vp = qkv_s[:, 2 * C + 2 * hd * p: 2 * C + 2 * hd * (p + 1)]
        qp = (qp.astype(jnp.float32) * scale).astype(qp.dtype)
        q0 = jnp.where(left, qp, jnp.zeros_like(qp))
        lhs = jnp.concatenate([q0, qp - q0], axis=0)          # [2N, 128]
        s = jax.lax.dot_general(lhs, kp, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o_all = jax.lax.dot_general(e.astype(qp.dtype), vp,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_all = o_all * (1.0 / l)
        out = (jnp.where(left, o_all[0:N], 0.0)
               + jnp.where(left, 0.0, o_all[N:2 * N]))
        out_s[:, 2 * hd * p: 2 * hd * (p + 1)] = out.astype(out_s.dtype)


def _attn_sublayer_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, o_ref, qkv_s, out_s,
                          *, heads: int, hd: int, scale: float):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])                  # fp32 [N, C]
    qkv = jax.lax.dot_general(ln.astype(wqkv_ref.dtype), wqkv_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    attn_core_pairs(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = jax.lax.dot_general(out_s[...], wproj_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = (xf + proj + bproj_ref[0]).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _sublayer_partitioned(heads: int, interpret: bool):
    return _batch_partitioned(
        lambda *a: _attention_sublayer_impl(*a, heads=heads,
                                            interpret=interpret),
        arg_ndims=(3, 2, 2, 2, 2, 2, 2), out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def attention_sublayer_serving(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                               wqkv: jax.Array, bqkv: jax.Array,
                               wproj: jax.Array, bproj: jax.Array, *,
                               heads: int, interpret: bool = False
                               ) -> jax.Array:
    """x [B,N,C] -> x + proj(mha(qkv(LN(x)))), deterministic serving path.

    gamma/beta: LN params fp32 [C].  wqkv [C,3C] / wproj [C,C] in compute
    dtype; biases fp32 [3C]/[C] (bqkv must include the BEiT q/v bias when
    qv_bias_only — the k slot zero).  Same restrictions as mha_serving_fused:
    heads even, (2*head_dim) % 128 == 0, no attention bias, no dropout.
    SPMD-partitions along the batch sharding (weights replicated).
    """
    C = x.shape[-1]
    return _sublayer_partitioned(heads, interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32), wqkv,
        bqkv.reshape(1, 3 * C).astype(jnp.float32), wproj,
        bproj.reshape(1, C).astype(jnp.float32))


def _attention_sublayer_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj, *,
                             heads, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    scale = hd ** -0.5
    dtype = wqkv.dtype
    flops = 2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
    const = lambda b: (0, 0)
    return pl.pallas_call(
        functools.partial(_attn_sublayer_kernel, heads=heads, hd=hd,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), dtype),
                        pltpu.VMEM((N, C), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=2 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj)


# --- DyT block prologue: sublayer + adapter + router head ---------------------
#
# The DyT block reads the post-attention activation x_mid three more times
# from HBM: the parallel adapter (dynamic_adapter.py:80-140), the router head
# (dynamic_adapter.py:58-77), and the MLP/dispatch input.  The adapter and
# router are tiny matmuls (40 MFLOP + 0.3 MFLOP per sample) whose cost is
# pure memory traffic — computing them inside the sublayer kernel while x_mid
# is still in VMEM makes them almost free.


def _dyt_prologue_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, wd_ref, bd_ref, wu_ref,
                         bu_ref, asc_ref, wsel_ref, bsel_ref,
                         o_ref, adapt_ref, sel_ref, qkv_s, out_s,
                         *, heads: int, hd: int, scale: float,
                         with_select: bool):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])
    qkv = jax.lax.dot_general(ln.astype(wqkv_ref.dtype), wqkv_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    attn_core_pairs(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = jax.lax.dot_general(out_s[...], wproj_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    xm = xf + proj + bproj_ref[0]                       # fp32 [N, C]
    o_ref[0] = xm.astype(o_ref.dtype)

    # adapter: up(relu(down(x_mid))) * scale, eval (no dropout)
    xm_c = xm.astype(wd_ref.dtype)
    down = jax.lax.dot_general(xm_c, wd_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    down = jnp.maximum(down + bd_ref[0], 0.0).astype(wd_ref.dtype)
    up = jax.lax.dot_general(down, wu_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    adapt_ref[0] = ((up + bu_ref[0]) * asc_ref[0, 0]).astype(adapt_ref.dtype)

    if with_select:
        # router head: fp32 1-unit Dense on x_mid (caller strips CLS row)
        logits = jax.lax.dot_general(xm, wsel_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        sel_ref[0] = logits + bsel_ref[0]


@functools.lru_cache(maxsize=None)
def _prologue_partitioned(heads: int, with_select: bool, interpret: bool):
    return _batch_partitioned(
        lambda *a: _dyt_prologue_impl(*a, heads=heads,
                                      with_select=with_select,
                                      interpret=interpret),
        arg_ndims=(3,) + (2,) * 13, out_ndims=(3, 3, 3))


@functools.partial(jax.jit,
                   static_argnames=("heads", "with_select", "interpret"))
def dyt_prologue_serving(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                         wdown, bdown, wup, bup, adapter_scale, wsel, bsel,
                         *, heads: int, with_select: bool = True,
                         interpret: bool = False):
    """Fused DyT serving prologue:
        x_mid  = x + proj(mha(qkv(LN(x))))
        adapt  = up(relu(down(x_mid))) * adapter_scale
        logits = x_mid @ wsel + bsel              (when with_select)
    Returns (x_mid, adapt, logits [B,N,1] fp32) or (x_mid, adapt).

    adapter_scale is an array (shape ()/(1,)) so the learnable-scalar option
    works unchanged.  Same applicability constraints as
    attention_sublayer_serving; adapter must be the standard parallel
    bottleneck (no in/out LN, no MoE).  SPMD-partitions along the batch
    sharding (weights replicated).
    """
    C = x.shape[-1]
    ffn = wdown.shape[1]
    outs = _prologue_partitioned(heads, with_select, interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32), wqkv,
        bqkv.reshape(1, 3 * C).astype(jnp.float32), wproj,
        bproj.reshape(1, C).astype(jnp.float32),
        wdown, bdown.reshape(1, ffn).astype(jnp.float32),
        wup, bup.reshape(1, C).astype(jnp.float32),
        jnp.asarray(adapter_scale, jnp.float32).reshape(1, 1),
        wsel.reshape(C, 1).astype(jnp.float32),
        jnp.asarray(bsel, jnp.float32).reshape(1, 1))
    x_mid, adapt, sel = outs
    return (x_mid, adapt, sel) if with_select else (x_mid, adapt)


def _dyt_prologue_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                       wdown, bdown, wup, bup, adapter_scale, wsel, bsel,
                       *, heads, with_select, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    ffn = wdown.shape[1]
    scale = hd ** -0.5
    dtype = wqkv.dtype
    const = lambda b: (0, 0)
    row = lambda b: (b, 0, 0)
    out_shape = [jax.ShapeDtypeStruct((B, N, C), x.dtype),
                 jax.ShapeDtypeStruct((B, N, C), x.dtype),
                 jax.ShapeDtypeStruct((B, N, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), row, memory_space=pltpu.VMEM)]
    flops = (2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
             + 4 * B * N * C * ffn)
    return pl.pallas_call(
        functools.partial(_dyt_prologue_kernel, heads=heads, hd=hd,
                          scale=scale, with_select=with_select),
        out_shape=tuple(out_shape),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, ffn), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((ffn, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), dtype),
                        pltpu.VMEM((N, C), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=3 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj, wdown, bdown, wup, bup,
      adapter_scale, wsel, bsel)


# --- MoE prologue: sublayer + MoE adapter + router head -----------------------
#
# The MoE-enhanced adapter (paper feature, reference README.md:27) is a dense
# mixture: every expert runs on every token and a per-token softmax router
# blends the outputs.  Off the prologue kernel it pays a measured ~1.21x
# serving premium (BENCH.md round 4, profile_moe_cost) — not for its FLOPs
# (the experts are d x bneck, tiny) but for falling back to the UNfused
# module path, which re-reads x_mid from HBM three times.  In-kernel the
# whole mixture is four small matmuls on the VMEM-resident x_mid:
#
#   g   = softmax((x_mid @ w_router) / tau)                  [N, E]  fp32
#   h   = relu(x_mid @ down2d + bd)                          [N, E*b]
#         (down2d[d, e*b+j] = down_kernel[e, d, j] — all experts as one
#          lane-concatenated contraction)
#   out = (h * (g @ expand)) @ up2d + g @ up_bias            [N, C]
#         (gate-weighting folded into the up contraction:
#          sum_e g_e * (h_e @ U_e) == concat_e(h_e * g_e) @ stack_e(U_e))


def moe_adapter_rows(xm, wrt_ref, wd_ref, bd_ref, wu_ref, bu_ref, asc_ref,
                     *, experts: int, bneck: int, tau: float):
    """MoE mixture on the VMEM-resident fp32 x_mid rows — shared by the bf16
    prologue kernel below and the int8 variant (ops/quant.py).  Returns the
    fp32 adapter rows [N, C]."""
    # router over experts: fp32 softmax (MoEAdapter semantics — no bias)
    r = jax.lax.dot_general(xm, wrt_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * (1.0 / tau)
    m = jnp.max(r, axis=-1, keepdims=True)
    eg = jnp.exp(r - m)
    gates = eg / jnp.sum(eg, axis=-1, keepdims=True)    # [N, E] fp32

    xm_c = xm.astype(wd_ref.dtype)
    h = jax.lax.dot_general(xm_c, wd_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h + bd_ref[0], 0.0)                 # [N, E*b] fp32

    # expand gates [N, E] -> [N, E*b] with a block one-hot matmul (static)
    row = jax.lax.broadcasted_iota(jnp.int32, (experts, experts * bneck), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (experts, experts * bneck), 1)
    expand = (col // bneck == row).astype(jnp.float32)
    gexp = jax.lax.dot_general(gates, expand, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    hg = (h * gexp).astype(wu_ref.dtype)
    up = jax.lax.dot_general(hg, wu_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    upb = jax.lax.dot_general(gates, bu_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (up + upb) * asc_ref[0, 0]


def _dyt_prologue_moe_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                             wproj_ref, bproj_ref, wrt_ref, wd_ref, bd_ref,
                             wu_ref, bu_ref, asc_ref, wsel_ref, bsel_ref,
                             o_ref, adapt_ref, sel_ref, qkv_s, out_s,
                             *, heads: int, hd: int, scale: float,
                             with_select: bool, experts: int, bneck: int,
                             tau: float):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])
    qkv = jax.lax.dot_general(ln.astype(wqkv_ref.dtype), wqkv_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    attn_core_pairs(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = jax.lax.dot_general(out_s[...], wproj_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    xm = xf + proj + bproj_ref[0]                       # fp32 [N, C]
    o_ref[0] = xm.astype(o_ref.dtype)

    adapt_ref[0] = moe_adapter_rows(
        xm, wrt_ref, wd_ref, bd_ref, wu_ref, bu_ref, asc_ref,
        experts=experts, bneck=bneck, tau=tau).astype(adapt_ref.dtype)

    if with_select:
        logits = jax.lax.dot_general(xm, wsel_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        sel_ref[0] = logits + bsel_ref[0]


@functools.lru_cache(maxsize=None)
def _prologue_moe_partitioned(heads: int, with_select: bool, experts: int,
                              bneck: int, tau: float, interpret: bool):
    return _batch_partitioned(
        lambda *a: _dyt_prologue_moe_impl(*a, heads=heads,
                                          with_select=with_select,
                                          experts=experts, bneck=bneck,
                                          tau=tau, interpret=interpret),
        arg_ndims=(3,) + (2,) * 14, out_ndims=(3, 3, 3))


@functools.partial(jax.jit,
                   static_argnames=("heads", "with_select", "tau",
                                    "interpret"))
def dyt_prologue_serving_moe(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                             wrouter, down_kernel, down_bias, up_kernel,
                             up_bias, adapter_scale, wsel, bsel, *,
                             heads: int, tau: float, with_select: bool = True,
                             interpret: bool = False):
    """Fused DyT serving prologue with the MoE-enhanced adapter:
        x_mid  = x + proj(mha(qkv(LN(x))))
        gates  = softmax((x_mid @ wrouter) / tau)
        adapt  = (sum_e gates_e * expert_e(x_mid)) * adapter_scale
        logits = x_mid @ wsel + bsel              (when with_select)
    Returns (x_mid, adapt, logits [B,N,1] fp32) or (x_mid, adapt).

    Stacked-expert params exactly as MoEAdapter declares them:
    wrouter [C,E], down_kernel [E,C,b], down_bias [E,b], up_kernel [E,b,C],
    up_bias [E,C].  Same applicability constraints as dyt_prologue_serving.
    SPMD-partitions along the batch sharding (weights replicated)."""
    C = x.shape[-1]
    E, _, b = down_kernel.shape
    dtype = wqkv.dtype
    down2d = down_kernel.transpose(1, 0, 2).reshape(C, E * b).astype(dtype)
    up2d = up_kernel.reshape(E * b, C).astype(dtype)
    outs = _prologue_moe_partitioned(heads, with_select, E, b, tau,
                                     interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32), wqkv,
        bqkv.reshape(1, 3 * C).astype(jnp.float32), wproj,
        bproj.reshape(1, C).astype(jnp.float32),
        wrouter.astype(jnp.float32), down2d,
        down_bias.reshape(1, E * b).astype(jnp.float32), up2d,
        up_bias.astype(jnp.float32),
        jnp.asarray(adapter_scale, jnp.float32).reshape(1, 1),
        wsel.reshape(C, 1).astype(jnp.float32),
        jnp.asarray(bsel, jnp.float32).reshape(1, 1))
    x_mid, adapt, sel = outs
    return (x_mid, adapt, sel) if with_select else (x_mid, adapt)


def _dyt_prologue_moe_impl(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                           wrouter, down2d, bdown, up2d, bu_mat,
                           adapter_scale, wsel, bsel, *, heads, with_select,
                           experts, bneck, tau, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    scale = hd ** -0.5
    dtype = wqkv.dtype
    eb = experts * bneck
    const = lambda b: (0, 0)
    row = lambda b: (b, 0, 0)
    out_shape = [jax.ShapeDtypeStruct((B, N, C), x.dtype),
                 jax.ShapeDtypeStruct((B, N, C), x.dtype),
                 jax.ShapeDtypeStruct((B, N, 1), jnp.float32)]
    out_specs = [pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, N, 1), row, memory_space=pltpu.VMEM)]
    flops = (2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
             + 4 * B * N * C * eb + 2 * B * N * C * experts)
    return pl.pallas_call(
        functools.partial(_dyt_prologue_moe_kernel, heads=heads, hd=hd,
                          scale=scale, with_select=with_select,
                          experts=experts, bneck=bneck, tau=tau),
        out_shape=tuple(out_shape),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, experts), const,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, eb), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, eb), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((eb, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((experts, C), const,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), dtype),
                        pltpu.VMEM((N, C), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N + B * N * experts,
            bytes_accessed=3 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj, wrouter, down2d, bdown,
      up2d, bu_mat, adapter_scale, wsel, bsel)


def attention_sublayer_reference(x, gamma, beta, wqkv, bqkv, wproj, bproj, *,
                                 heads: int):
    """XLA composition the sublayer kernel replaces (for tests/fallback)."""
    B, N, C = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta).astype(wqkv.dtype)
    qkv = (jnp.dot(ln, wqkv, preferred_element_type=jnp.float32)
           + bqkv).astype(wqkv.dtype)
    o = mha_fused_reference(qkv, heads=heads)
    proj = jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj
    return (xf + proj).astype(x.dtype)
