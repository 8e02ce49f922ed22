"""Int8 (W8A8) serving quantization — MXU double-rate path.

The v5e MXU runs s8 x s8 -> s32 matmuls at ~2x the bf16 rate (measured
114.6 TOPS vs 55.6 TFLOPS at the per-sample qkv shape [197,768]x[768,2304],
scripts/profile_int8.py).  The serving forward's FLOPs are dominated by the
qkv / out-proj / MLP matmuls, so quantizing exactly those — and nothing
else — buys most of the 2x while keeping every numerically delicate piece
(LayerNorm, softmax, residual stream, router head, adapter) in fp32/bf16.

Scheme: symmetric per-output-channel int8 weights (static, from the bf16
checkpoint) x symmetric dynamic per-row (per-token) int8 activations,
quantized inside the kernel while the activation tile is in VMEM:

    out[m, n] = (sum_k q_a[m,k] * q_w[k,n]) * row_scale[m] * col_scale[n]

This is the standard dynamic-quant recipe (LLM.int8()/SmoothQuant family)
that holds ViT accuracy to <0.5%% top-1; the resulting drift is measured
against the committed torch golden fixture in tests/test_quant.py.

The reference has no quantized path (torch AMP fp16 only,
/root/reference/speed.py:247-275); this is a TPU-native extension for
production serving.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic_tuning_tpu.ops.mha_serving import (_batch_partitioned,
                                                  erf_f32 as _erf_f32,
                                                attn_core_pairs,
                                                layernorm_f32,
                                                moe_adapter_rows
                                                as _moe_adapter_rows)


def quantize_weight(w: jax.Array):
    """[K, N] float -> (int8 [K, N], fp32 col_scale [1, N]).

    Symmetric per-output-channel: scale = amax_k |w[:, n]| / 127.  Traced
    under jit at serving time — the cost (one pass over the weights per
    batch) is noise next to the matmuls they feed.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)            # [1, N]
    scale = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q = jnp.clip(jnp.round(wf * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _row_quant(xf: jax.Array):
    """fp32 [M, K] -> (int8 [M, K], fp32 row_scale [M, 1]); in-kernel."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax * (1.0 / 127.0)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q = jnp.clip(jnp.round(xf * inv), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _q8_matmul(xf, w_ref, colscale_ref):
    """fp32 [M, K] @ int8 [K, N] -> fp32 [M, N] via dynamic row quant."""
    q, rs = _row_quant(xf)
    acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * rs * colscale_ref[0]


# --- int8 LN+MLP kernel -------------------------------------------------------
#
# The serving MLP (dense path: every token; dispatch path: the gathered
# [B*K, C] rows) as one grid-tiled program: LN -> int8 fc1 -> GELU -> int8
# fc2, weights VMEM-resident across the grid.  Emits the MLP contribution
# (caller adds residual / scatters), replacing Mlp+norm2 in Block's serving
# composition (reference vision_transformer_IN21K.py:157-163).




def _gelu_f32(x, approximate: bool):
    if approximate:
        return jax.nn.gelu(x, approximate=True)
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _q8_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, o_ref, *, gelu_approx: bool,
                   with_ln: bool):
    xf = x_ref[...].astype(jnp.float32)
    if with_ln:
        xf = layernorm_f32(xf, g_ref[0], b_ref[0])
    h = _q8_matmul(xf, w1_ref, s1_ref) + b1_ref[0]
    h = _gelu_f32(h, gelu_approx)
    out = _q8_matmul(h, w2_ref, s2_ref) + b2_ref[0]
    o_ref[...] = out.astype(o_ref.dtype)


def _q8_ln_mlp_impl(x3, g, b, w1, s1, b1, w2, s2, b2, *, gelu_approx,
                    with_ln, interpret):
    B, R, C = x3.shape
    H = w1.shape[1]
    TM = 128
    M = ((B * R + TM - 1) // TM) * TM
    x = x3.reshape(B * R, C)
    if M != B * R:
        # zero rows quantize to zero exactly; padded outputs are dropped
        x = jnp.pad(x, ((0, M - B * R), (0, 0)))
    const = lambda i: (0, 0)
    flops = 4 * M * C * H
    out = pl.pallas_call(
        functools.partial(_q8_mlp_kernel, gelu_approx=gelu_approx,
                          with_ln=with_ln),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // TM,),
        in_specs=[pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=M * H,
            bytes_accessed=2 * M * C * x.dtype.itemsize + C * H * 2),
        interpret=interpret,
    )(x, g, b, w1, s1, b1, w2, s2, b2)
    return out[:B * R].reshape(B, R, C)


@functools.lru_cache(maxsize=None)
def _mlp_partitioned(gelu_approx: bool, with_ln: bool, interpret: bool):
    return _batch_partitioned(
        lambda *a: _q8_ln_mlp_impl(*a, gelu_approx=gelu_approx,
                                   with_ln=with_ln, interpret=interpret),
        arg_ndims=(3,) + (2,) * 8, out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("gelu_approx", "with_ln",
                                             "interpret"))
def q8_ln_mlp(x: jax.Array, gamma, beta, w1, b1, w2, b2, *,
              gelu_approx: bool = False, with_ln: bool = True,
              interpret: bool = False) -> jax.Array:
    """Int8 serving MLP on [B, R, C] rows: LN -> fc1 -> GELU -> fc2.

    ``w1``/``w2`` arrive as regular float weights; per-channel int8
    quantization happens here (XLA, once per call) and dynamic per-row
    activation quantization happens inside the kernel (rows flatten to
    B*R and pad to the 128-row grid tile; zero rows quantize to zero).
    Returns the MLP output (no residual).  SPMD-partitions along the
    batch sharding (weights replicated).
    """
    C = x.shape[-1]
    H = w1.shape[1]
    q1, s1 = quantize_weight(w1)
    q2, s2 = quantize_weight(w2)
    return _mlp_partitioned(gelu_approx, with_ln, interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        q1, s1, b1.reshape(1, H).astype(jnp.float32),
        q2, s2, b2.reshape(1, C).astype(jnp.float32))


def q8_ln_mlp_reference(x, gamma, beta, w1, b1, w2, b2, *,
                        gelu_approx=False, with_ln=True):
    """Same arithmetic as the kernel, in plain jnp (parity tests).
    x: [..., C]."""
    xf = x.astype(jnp.float32)
    if with_ln:
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    q1, s1 = quantize_weight(w1)
    q2, s2 = quantize_weight(w2)

    def mm(a, w, s):
        qa, rs = _row_quant(a)
        acc = jnp.einsum("...k,kn->...n", qa.astype(jnp.int32),
                         w.astype(jnp.int32))
        return acc.astype(jnp.float32) * rs * s
    h = mm(xf, q1, s1) + b1
    h = _gelu_f32(h, gelu_approx)
    out = mm(h, q2, s2) + b2
    return out.astype(x.dtype)


# --- fused int8 dispatch MLP (validated experiment — loses) -------------------
#
# The dispatch path's gather (one-hot @ x), LN+MLP on the K kept rows, and
# scatter (one-hot^T @ y) as ONE program per sample, so the [B, K, C]
# gathered rows never touch HBM.  Measured SLOWER than the unfused
# composition (714 vs 570 us/block at bench shapes): XLA's batched one-hot
# matmul plus the 128-row-tiled q8_ln_mlp beat the per-sample M=99 tiles —
# the HBM saving (~136 us) is smaller than the tiling penalty.  Kept as a
# tested reference point (tests/test_quant.py) for the fusion boundary;
# Block uses ops/dispatch.py::onehot_dispatch_mlp + q8_ln_mlp.
# Semantics: the one-hot matrix (threshold mask folded in) is built by the
# caller; masked slots gather zero rows whose MLP output the zero scatter
# column drops — identical to onehot_dispatch_mlp.


def _q8_dispatch_mlp_kernel(x_ref, oh_ref, g_ref, b_ref, w1_ref, s1_ref,
                            b1_ref, w2_ref, s2_ref, b2_ref, o_ref,
                            *, gelu_approx: bool):
    x = x_ref[0]                                           # [N, C] bf16
    oh = oh_ref[0]                                         # [K, N] bf16
    xg = jax.lax.dot_general(oh, x, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ln = layernorm_f32(xg, g_ref[0], b_ref[0])
    h = _q8_matmul(ln, w1_ref, s1_ref) + b1_ref[0]
    h = _gelu_f32(h, gelu_approx)
    y = _q8_matmul(h, w2_ref, s2_ref) + b2_ref[0]          # [K, C] f32
    out = jax.lax.dot_general(oh, y.astype(oh.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _q8_dispatch_mlp_impl(x, oh, g, b, w1, s1, b1, w2, s2, b2, *,
                          gelu_approx, interpret):
    B, N, C = x.shape
    K = oh.shape[1]
    H = w1.shape[1]
    const = lambda bb: (0, 0)
    row = lambda bb: (bb, 0, 0)
    flops = 4 * B * K * C * H + 4 * B * K * N * C
    return pl.pallas_call(
        functools.partial(_q8_dispatch_mlp_kernel, gelu_approx=gelu_approx),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, N), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * K * H,
            bytes_accessed=2 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, oh, g, b, w1, s1, b1, w2, s2, b2)


@functools.lru_cache(maxsize=None)
def _dispatch_mlp_partitioned(gelu_approx: bool, interpret: bool):
    return _batch_partitioned(
        lambda *a: _q8_dispatch_mlp_impl(*a, gelu_approx=gelu_approx,
                                         interpret=interpret),
        arg_ndims=(3, 3) + (2,) * 8, out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("capacity", "gelu_approx",
                                             "threshold", "interpret"))
def q8_dispatch_mlp(x, scores, gamma, beta, w1, b1, w2, b2, *,
                    capacity: int, gelu_approx: bool = False,
                    threshold: float = 0.5, interpret: bool = False):
    """Capacity dispatch + LN + int8 MLP + scatter, fused.

    x: [B, N, C]; scores: [B, N] keep probabilities (CLS slot pre-forced to
    +inf).  Returns (mlp_contribution [B, N, C], effective_gate [B, N]) —
    the same contract as ops/dispatch.py::onehot_dispatch_mlp with the MLP
    on the int8 kernel and zero HBM traffic for the gathered rows.
    SPMD-partitions along the batch sharding.
    """
    C = x.shape[-1]
    H = w1.shape[1]
    vals, idx = jax.lax.top_k(scores, capacity)
    keep = (vals > threshold).astype(x.dtype)
    oh = jax.nn.one_hot(idx, x.shape[1], dtype=x.dtype) * keep[..., None]
    q1, s1 = quantize_weight(w1)
    q2, s2 = quantize_weight(w2)
    out = _dispatch_mlp_partitioned(gelu_approx, interpret)(
        x, oh, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        q1, s1, b1.reshape(1, H).astype(jnp.float32),
        q2, s2, b2.reshape(1, C).astype(jnp.float32))
    return out, oh.sum(axis=1)


# --- int8 attention core ------------------------------------------------------
#
# Optional full-int8 core (quant="int8_attn"): scores = int8 q @ int8
# k-centered, probs @ v = int8 x per-lane-int8.  Centering k by its per-lane
# mean before quantization removes the common mode that dominates trained
# ViT keys; the centering shifts every score row by a constant which the
# softmax normalization cancels EXACTLY (e and l scale by the same factor),
# so the only approximation is the int8 rounding of the centered values —
# the SageAttention-style smoothing argument.


def attn_core_pairs_q8(qkv_s, out_s, *, heads: int, hd: int, scale: float):
    N = qkv_s.shape[0]
    C = heads * hd
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * hd), 1)
    left = lane < hd
    for p in range(heads // 2):
        qp = qkv_s[:, 2 * hd * p: 2 * hd * (p + 1)].astype(jnp.float32)
        kp = qkv_s[:, C + 2 * hd * p: C + 2 * hd * (p + 1)].astype(jnp.float32)
        vp = qkv_s[:, 2 * C + 2 * hd * p: 2 * C + 2 * hd * (p + 1)]
        qp = qp * scale
        q0 = jnp.where(left, qp, jnp.zeros_like(qp))
        lhs = jnp.concatenate([q0, qp - q0], axis=0)          # [2N, 128] f32
        kc = kp - jnp.mean(kp, axis=0, keepdims=True)         # center lanes
        ql, qs = _row_quant(lhs)
        kq, ks = _row_quant(kc)
        s = jax.lax.dot_general(ql, kq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        s = s.astype(jnp.float32) * qs * ks.reshape(1, N)
        e = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
        l = jnp.sum(e, axis=-1, keepdims=True)
        # AV stays bf16: quantizing the [2N, N] prob tensor costs more VPU
        # time than the int8 matmul saves at these shapes (measured — see
        # BENCH.md int8_attn notes)
        o_all = jax.lax.dot_general(e.astype(vp.dtype), vp,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_all = o_all * (1.0 / l)
        out = (jnp.where(left, o_all[0:N], 0.0)
               + jnp.where(left, 0.0, o_all[N:2 * N]))
        out_s[:, 2 * hd * p: 2 * hd * (p + 1)] = out.astype(out_s.dtype)


# --- int8 plain attention sublayer (dense baseline) ---------------------------


def _attn_sublayer_q8_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                             bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
                             o_ref, qkv_s, out_s, *, heads: int, hd: int,
                             scale: float, attn_q8: bool):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])
    qkv = _q8_matmul(ln, wqkv_ref, sqkv_ref)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    core = attn_core_pairs_q8 if attn_q8 else attn_core_pairs
    core(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = _q8_matmul(out_s[...].astype(jnp.float32), wproj_ref, sproj_ref)
    o_ref[0] = (xf + proj + bproj_ref[0]).astype(o_ref.dtype)


def _attn_sublayer_q8_impl(x, g, b, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                           *, heads, attn_q8, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    scale = hd ** -0.5
    const = lambda b: (0, 0)
    row = lambda b: (b, 0, 0)
    flops = 2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
    return pl.pallas_call(
        functools.partial(_attn_sublayer_q8_kernel, heads=heads, hd=hd,
                          scale=scale, attn_q8=attn_q8),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), jnp.bfloat16),
                        pltpu.VMEM((N, C), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=2 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, g, b, wqkv, sqkv, bqkv, wproj, sproj, bproj)


@functools.lru_cache(maxsize=None)
def _sublayer_q8_partitioned(heads: int, attn_q8: bool, interpret: bool):
    return _batch_partitioned(
        lambda *a: _attn_sublayer_q8_impl(*a, heads=heads, attn_q8=attn_q8,
                                          interpret=interpret),
        arg_ndims=(3,) + (2,) * 8, out_ndims=(3,))


@functools.partial(jax.jit, static_argnames=("heads", "attn_q8",
                                             "interpret"))
def attention_sublayer_serving_q8(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                                  *, heads: int, attn_q8: bool = False,
                                  interpret: bool = False):
    """Int8 variant of ``attention_sublayer_serving`` (same contract):
    x [B,N,C] -> x + proj(mha(qkv(LN(x)))) with qkv/proj on the int8 MXU
    path.  Weights arrive as floats and are per-channel quantized here."""
    C = x.shape[-1]
    qqkv, sqkv = quantize_weight(wqkv)
    qproj, sproj = quantize_weight(wproj)
    return _sublayer_q8_partitioned(heads, attn_q8, interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        qqkv, sqkv, bqkv.reshape(1, 3 * C).astype(jnp.float32),
        qproj, sproj, bproj.reshape(1, C).astype(jnp.float32))


# --- int8 DyT prologue --------------------------------------------------------
#
# The int8 variant of ops/mha_serving.py::dyt_prologue_serving: qkv and
# out-proj matmuls run s8xs8->s32 on the MXU; the attention core, adapter,
# residual stream and router head keep the bf16/fp32 arithmetic of the
# baseline kernel (they are cheap and numerically delicate).


def _dyt_prologue_q8_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                            bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
                            wd_ref, bd_ref, wu_ref, bu_ref, asc_ref,
                            wsel_ref, bsel_ref,
                            o_ref, adapt_ref, sel_ref, qkv_s, out_s,
                            *, heads: int, hd: int, scale: float,
                            with_select: bool, attn_q8: bool):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])
    qkv = _q8_matmul(ln, wqkv_ref, sqkv_ref)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    core = attn_core_pairs_q8 if attn_q8 else attn_core_pairs
    core(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = _q8_matmul(out_s[...].astype(jnp.float32), wproj_ref, sproj_ref)
    xm = xf + proj + bproj_ref[0]
    o_ref[0] = xm.astype(o_ref.dtype)

    xm_c = xm.astype(wd_ref.dtype)
    down = jax.lax.dot_general(xm_c, wd_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    down = jnp.maximum(down + bd_ref[0], 0.0).astype(wd_ref.dtype)
    up = jax.lax.dot_general(down, wu_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    adapt_ref[0] = ((up + bu_ref[0]) * asc_ref[0, 0]).astype(adapt_ref.dtype)

    if with_select:
        logits = jax.lax.dot_general(xm, wsel_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        sel_ref[0] = logits + bsel_ref[0]


def _dyt_prologue_q8_impl(x, g, b, wqkv, sqkv, bqkv, wproj, sproj, bproj,
                          wd, bd, wu, bu, asc, wsel, bsel, *, heads,
                          with_select, attn_q8, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    ffn = wd.shape[1]
    scale = hd ** -0.5
    adtype = wd.dtype
    const = lambda b: (0, 0)
    row = lambda b: (b, 0, 0)
    flops = (2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
             + 4 * B * N * C * ffn)
    return pl.pallas_call(
        functools.partial(_dyt_prologue_q8_kernel, heads=heads, hd=hd,
                          scale=scale, with_select=with_select,
                          attn_q8=attn_q8),
        out_shape=(jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.float32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, ffn), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((ffn, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 1), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, 1), row, memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), adtype),
                        pltpu.VMEM((N, C), adtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N,
            bytes_accessed=3 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, g, b, wqkv, sqkv, bqkv, wproj, sproj, bproj, wd, bd, wu, bu, asc,
      wsel, bsel)


@functools.lru_cache(maxsize=None)
def _prologue_q8_partitioned(heads: int, with_select: bool, attn_q8: bool,
                             interpret: bool):
    return _batch_partitioned(
        lambda *a: _dyt_prologue_q8_impl(*a, heads=heads,
                                         with_select=with_select,
                                         attn_q8=attn_q8,
                                         interpret=interpret),
        arg_ndims=(3,) + (2,) * 15, out_ndims=(3, 3, 3))


@functools.partial(jax.jit,
                   static_argnames=("heads", "with_select", "attn_q8",
                                    "interpret"))
def dyt_prologue_serving_q8(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                            wdown, bdown, wup, bup, adapter_scale, wsel,
                            bsel, *, heads: int, with_select: bool = True,
                            attn_q8: bool = False, interpret: bool = False):
    """Int8 fused DyT serving prologue — same contract as
    ``dyt_prologue_serving`` (x_mid, adapt[, router logits]) with the qkv
    and out-proj matmuls on the MXU int8 path.  Weights arrive as floats;
    per-channel quantization is traced here, per-row activation
    quantization happens in-kernel.  SPMD-partitions along the batch
    sharding (weights replicated)."""
    C = x.shape[-1]
    ffn = wdown.shape[1]
    qqkv, sqkv = quantize_weight(wqkv)
    qproj, sproj = quantize_weight(wproj)
    outs = _prologue_q8_partitioned(heads, with_select, attn_q8,
                                    interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        qqkv, sqkv, bqkv.reshape(1, 3 * C).astype(jnp.float32),
        qproj, sproj, bproj.reshape(1, C).astype(jnp.float32),
        wdown, bdown.reshape(1, ffn).astype(jnp.float32),
        wup, bup.reshape(1, C).astype(jnp.float32),
        jnp.asarray(adapter_scale, jnp.float32).reshape(1, 1),
        wsel.reshape(C, 1).astype(jnp.float32),
        jnp.asarray(bsel, jnp.float32).reshape(1, 1))
    x_mid, adapt, sel = outs
    return (x_mid, adapt, sel) if with_select else (x_mid, adapt)


# --- int8 DyT prologue with the MoE-enhanced adapter ---------------------------
#
# Same contract as ops/mha_serving.py::dyt_prologue_serving_moe with the qkv
# and out-proj matmuls on the int8 MXU path; the MoE mixture itself (router
# softmax + lane-concatenated expert contraction on the VMEM-resident x_mid,
# shared helper moe_adapter_rows) keeps the bf16/fp32 arithmetic — the
# experts are tiny (C x bneck), their cost is fusion, not flops.


def _dyt_prologue_q8_moe_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                                bqkv_ref, wproj_ref, sproj_ref, bproj_ref,
                                wrt_ref, wd_ref, bd_ref, wu_ref, bu_ref,
                                asc_ref, wsel_ref, bsel_ref,
                                o_ref, adapt_ref, sel_ref, qkv_s, out_s,
                                *, heads: int, hd: int, scale: float,
                                with_select: bool, attn_q8: bool,
                                experts: int, bneck: int, tau: float):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    ln = layernorm_f32(xf, g_ref[0], b_ref[0])
    qkv = _q8_matmul(ln, wqkv_ref, sqkv_ref)
    qkv_s[...] = (qkv + bqkv_ref[0]).astype(qkv_s.dtype)

    core = attn_core_pairs_q8 if attn_q8 else attn_core_pairs
    core(qkv_s, out_s, heads=heads, hd=hd, scale=scale)

    proj = _q8_matmul(out_s[...].astype(jnp.float32), wproj_ref, sproj_ref)
    xm = xf + proj + bproj_ref[0]
    o_ref[0] = xm.astype(o_ref.dtype)

    adapt_ref[0] = _moe_adapter_rows(
        xm, wrt_ref, wd_ref, bd_ref, wu_ref, bu_ref, asc_ref,
        experts=experts, bneck=bneck, tau=tau).astype(adapt_ref.dtype)

    if with_select:
        logits = jax.lax.dot_general(xm, wsel_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        sel_ref[0] = logits + bsel_ref[0]


def _dyt_prologue_q8_moe_impl(x, g, b, wqkv, sqkv, bqkv, wproj, sproj,
                              bproj, wrt, wd, bd, wu, bu, asc, wsel, bsel,
                              *, heads, with_select, attn_q8, experts,
                              bneck, tau, interpret):
    B, N, C = x.shape
    hd = C // heads
    assert heads % 2 == 0 and (2 * hd) % 128 == 0, (heads, hd)
    eb = experts * bneck
    scale = hd ** -0.5
    adtype = wd.dtype
    const = lambda b: (0, 0)
    row = lambda b: (b, 0, 0)
    flops = (2 * B * N * C * 4 * C + 2 * 2 * B * heads * N * N * 2 * hd
             + 4 * B * N * C * eb + 2 * B * N * C * experts)
    return pl.pallas_call(
        functools.partial(_dyt_prologue_q8_moe_kernel, heads=heads, hd=hd,
                          scale=scale, with_select=with_select,
                          attn_q8=attn_q8, experts=experts, bneck=bneck,
                          tau=tau),
        out_shape=(jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((B, N, C), x.dtype),
                   jax.ShapeDtypeStruct((B, N, 1), jnp.float32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
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
        out_specs=(pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, C), row, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, 1), row, memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((N, 3 * C), adtype),
                        pltpu.VMEM((N, C), adtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=B * heads * N * N + B * N * experts,
            bytes_accessed=3 * x.size * x.dtype.itemsize),
        interpret=interpret,
    )(x, g, b, wqkv, sqkv, bqkv, wproj, sproj, bproj, wrt, wd, bd, wu, bu,
      asc, wsel, bsel)


@functools.lru_cache(maxsize=None)
def _prologue_q8_moe_partitioned(heads: int, with_select: bool,
                                 attn_q8: bool, experts: int, bneck: int,
                                 tau: float, interpret: bool):
    return _batch_partitioned(
        lambda *a: _dyt_prologue_q8_moe_impl(*a, heads=heads,
                                             with_select=with_select,
                                             attn_q8=attn_q8,
                                             experts=experts, bneck=bneck,
                                             tau=tau, interpret=interpret),
        arg_ndims=(3,) + (2,) * 16, out_ndims=(3, 3, 3))


@functools.partial(jax.jit,
                   static_argnames=("heads", "tau", "with_select",
                                    "attn_q8", "interpret"))
def dyt_prologue_serving_q8_moe(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                                wrouter, down_kernel, down_bias, up_kernel,
                                up_bias, adapter_scale, wsel, bsel, *,
                                heads: int, tau: float,
                                with_select: bool = True,
                                attn_q8: bool = False,
                                interpret: bool = False):
    """Int8 fused DyT serving prologue with the MoE-enhanced adapter — same
    contract as ``dyt_prologue_serving_moe`` (x_mid, adapt[, router logits])
    with the qkv and out-proj matmuls on the MXU int8 path.  Stacked-expert
    params exactly as MoEAdapter declares them (already cast to the adapter
    compute dtype by the caller): wrouter [C,E], down_kernel [E,C,b],
    down_bias [E,b], up_kernel [E,b,C], up_bias [E,C].  SPMD-partitions
    along the batch sharding (weights replicated)."""
    C = x.shape[-1]
    E, _, b = down_kernel.shape
    down2d = down_kernel.transpose(1, 0, 2).reshape(C, E * b)
    up2d = up_kernel.reshape(E * b, C)
    qqkv, sqkv = quantize_weight(wqkv)
    qproj, sproj = quantize_weight(wproj)
    outs = _prologue_q8_moe_partitioned(heads, with_select, attn_q8, E, b,
                                        tau, interpret)(
        x, gamma.reshape(1, C).astype(jnp.float32),
        beta.reshape(1, C).astype(jnp.float32),
        qqkv, sqkv, bqkv.reshape(1, 3 * C).astype(jnp.float32),
        qproj, sproj, bproj.reshape(1, C).astype(jnp.float32),
        wrouter.astype(jnp.float32), down2d,
        down_bias.reshape(1, E * b).astype(jnp.float32), up2d,
        up_bias.astype(jnp.float32),
        jnp.asarray(adapter_scale, jnp.float32).reshape(1, 1),
        wsel.reshape(C, 1).astype(jnp.float32),
        jnp.asarray(bsel, jnp.float32).reshape(1, 1))
    x_mid, adapt, sel = outs
    return (x_mid, adapt, sel) if with_select else (x_mid, adapt)


def q8_conv(x: jax.Array, w: jax.Array, *, strides, padding: str) -> jax.Array:
    """Serving s8 x s8 conv shared by the int8 patch-embed stem
    (models/vit.py) and the seg-head ConvModule (models/upernet.py):
    per-output-channel int8 weights x per-SAMPLE dynamic int8 activations
    (a conv window mixes neighbouring pixels, so the activation scale must
    be window-constant; per-sample is the finest legal grain and keeps
    outputs batch-invariant and shard-local).  XLA lowers int8 x int8
    convs with preferred_element_type=int32 straight onto the MXU double-
    rate path (measured 257 TOPS at the UPerHead bottleneck) — no Pallas
    needed.  Returns fp32 [B, H', W', Cout] (caller adds bias / casts)."""
    wf = w.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))                   # [Cout]
    wq = jnp.clip(jnp.round(wf * jnp.where(
        wmax > 0, 127.0 / wmax, 0.0)), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)    # [B,1,1,1]
    xq = jnp.clip(jnp.round(xf * jnp.where(
        amax > 0, 127.0 / amax, 0.0)), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * ((amax / 127.0) * (wmax / 127.0))
