"""Hand-optimized DyT ViT inference forward (the TPU "speed-test model").

The reference keeps a separate efficient-inference model
(models/model_speed_test.py) that realizes actual token-skipping savings.
This is its TPU-native counterpart: a pure function over the SAME param tree
the flax model produces, free of module overhead, with:

  * patch embed as a single reshape+matmul (stride==kernel conv == matmul,
    MXU-friendly, no conv lowering);
  * bf16 residual stream end-to-end;
  * capacity-bounded top-k dispatch for the MLP (ops/dispatch.py semantics);
  * optional Pallas fused LN+fc1+GELU+fc2 kernel (ops/fused_mlp.py) that keeps
    the 4C-wide hidden activation in VMEM.

Numerics: matches the flax model's eval dispatch path (bf16 tolerance);
tests pin it against the flax forward.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.ops.dispatch import capacity_for
from dynamic_tuning_tpu.ops.fused_mlp import fused_ln_mlp

BF16 = jnp.bfloat16


def _ln(x: jax.Array, p: Dict) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"])


def _ln_dense_folded(x: jax.Array, ln_p: Dict, dense_p: Dict) -> jax.Array:
    """dense(LN(x)) with the LN affine folded into the matmul:
    LN(x)@W + b == normalize(x)@(scale*W) + (bias@W + b) — saves two
    elementwise passes over the activations; the folded weights are
    loop-invariant so XLA hoists the folding out of serving loops."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(BF16)
    kernel = dense_p["kernel"].astype(jnp.float32)
    w = (ln_p["scale"][:, None] * kernel).astype(BF16)
    b = dense_p["bias"] + ln_p["bias"] @ kernel
    y = jnp.dot(xn, w, preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def _dense(x: jax.Array, p: Dict) -> jax.Array:
    y = jnp.dot(x.astype(BF16), p["kernel"].astype(BF16),
                preferred_element_type=jnp.float32)
    return y + p["bias"].astype(jnp.float32)


def _attention(x: jax.Array, p: Dict, num_heads: int) -> jax.Array:
    """Pretransposed batched-dot_general attention with fp32 softmax (free in
    this layout, scripts/profile_attn3.py) and LN folded into the qkv matmul."""
    B, N, C = x.shape
    hd = C // num_heads
    qkv = _ln_dense_folded(x, p["norm1"], p["attn"]["qkv"])
    # one explicit [3,B,H,N,D] transpose + batched dot_generals beats the
    # einsum lowering by ~27% (BENCH.md attention notes)
    qkv = qkv.astype(BF16).reshape(B, N, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # [B,H,N,D]
    # fp32 scores+softmax cost the same as bf16 in this layout
    # (scripts/profile_attn3.py) — keep full softmax precision
    s = jax.lax.dot_general(q * (hd ** -0.5), k,
                            (((3,), (3,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
    # no-max softmax + deferred normalization (see models/layers.py serving
    # branch): one fewer pass over the fp32 score tensor.  Two-sided clamp
    # guards overflow (row max > 108) and all-zero underflow (row max < -67);
    # exact to fp32 resolution for row max in [-60, 80].
    expw = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(BF16)
    out = jax.lax.dot_general(expw, v, (((3,), (2,)), ((0, 1), (0, 1))),
                              preferred_element_type=jnp.float32)
    l = jnp.sum(expw.astype(jnp.float32), axis=-1, keepdims=True)
    out = (out / l).astype(BF16)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    return _dense(out, p["attn"]["proj"]).astype(BF16)


def _adapter(x: jax.Array, p: Dict, scale: float) -> jax.Array:
    down = jax.nn.relu(_dense(x, p["down_proj"]))
    return (_dense(down.astype(BF16), p["up_proj"]) * scale).astype(BF16)


def _block(x: jax.Array, p: Dict, *, num_heads: int, tuning: TuningConfig,
           select: SelectConfig, mode: str, use_pallas: bool,
           interpret: bool, gelu_approx: bool) -> Tuple[jax.Array, Optional[jax.Array]]:
    B, N, C = x.shape
    x = x + _attention(x, p, num_heads)

    gate, scores = None, None
    routed = "mlp_token_select" in p and select.open and mode != "dense"
    if routed:
        logits = _dense(x[:, 1:].astype(jnp.float32),
                        p["mlp_token_select"]["mlp_head"])[..., 0]
        scores = jax.nn.sigmoid(logits)
        gate = jnp.concatenate(
            [jnp.ones((B, 1), jnp.float32), (scores > select.threshold)
             .astype(jnp.float32)], axis=1)

    if "adaptmlp" in p:
        if tuning.ffn_adapter_scalar == "learnable_scalar":
            # trained per-block scalar lives in the param tree
            # (models/layers.py Adapter); shape (1,) broadcasts over up-proj
            scale = p["adaptmlp"]["scale"].astype(BF16)
        else:
            scale = float(tuning.ffn_adapter_scalar)
        adapt = _adapter(x, p["adaptmlp"], scale)
    else:
        adapt = 0.0

    mp = p["mlp"]
    ln2 = p["norm2"]

    def run_mlp(rows2d, gate2d):
        if use_pallas:
            return fused_ln_mlp(rows2d, ln2["scale"], ln2["bias"],
                                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                                gate2d, gelu_approx=gelu_approx,
                                interpret=interpret)
        h = _ln_dense_folded(rows2d, ln2, mp["fc1"])
        h = jax.nn.gelu(h, approximate=gelu_approx)
        y = _dense(h.astype(BF16), mp["fc2"])
        if gate2d is not None:
            y = y * gate2d.astype(jnp.float32)
        return y.astype(rows2d.dtype)

    if routed and mode == "dispatch":
        from dynamic_tuning_tpu.ops.dispatch import onehot_dispatch_mlp

        ratio = (select.capacity_ratio if select.capacity_ratio is not None
                 else select.token_target_ratio)
        K = capacity_for(N - 1, ratio)
        scores_full = jnp.concatenate(
            [jnp.full((B, 1), jnp.inf, jnp.float32), scores], axis=1)
        mlp_out, gate = onehot_dispatch_mlp(
            x, scores_full, K,
            lambda rows: run_mlp(rows.reshape(-1, C), None
                                 ).reshape(B, K, C),
            select.threshold)
    else:
        g2d = None if gate is None else gate.reshape(B * N, 1).astype(x.dtype)
        mlp_out = run_mlp(x.reshape(B * N, C), g2d).reshape(B, N, C)

    x = x + mlp_out.astype(x.dtype) + adapt
    return x, gate


@partial(jax.jit, static_argnames=("cfg", "tuning", "select", "mode",
                                   "use_pallas", "interpret"))
def fast_vit_forward(params: Dict, x: jax.Array, *, cfg: ModelConfig,
                     tuning: TuningConfig = TuningConfig(),
                     select: SelectConfig = SelectConfig(),
                     mode: str = "dispatch", use_pallas: bool = False,
                     interpret: bool = False
                     ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """mode: "dispatch" (capacity top-k) | "mask" (dense masked) | "dense"
    (complete model).  Returns (logits [B, classes], gates [B, L, N] or None).
    """
    if tuning.ffn_adapt and tuning.ffn_adapter_layernorm_option != "none":
        raise ValueError(
            "fast_vit_forward supports ffn_adapter_layernorm_option='none' "
            "only (the in/out adapter LayerNorm params would be silently "
            "dropped); use the flax model for that config")
    if tuning.moe_experts and tuning.moe_experts > 1:
        raise ValueError(
            "fast_vit_forward does not implement the MoE adapter; "
            "use the flax model for moe_experts > 1")
    B = x.shape[0]
    ps = cfg.patch_size
    gh = gw = cfg.img_size // ps

    # patch embed as one matmul: [B,gh,ps,gw,ps,3] -> [B,gh*gw, ps*ps*3]
    xb = x.astype(BF16).reshape(B, gh, ps, gw, ps, 3)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, ps * ps * 3)
    kern = params["patch_embed"]["proj"]["kernel"].astype(BF16)  # [ps,ps,3,C]
    kern = kern.reshape(ps * ps * 3, -1)
    tokens = jnp.dot(xb, kern, preferred_element_type=jnp.float32)
    tokens = tokens + params["patch_embed"]["proj"]["bias"]

    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    h = jnp.concatenate([cls, tokens], axis=1) + params["pos_embed"]
    h = h.astype(BF16)

    gates = []   # collected as fp32: bf16 sums saturate at 256 in accounting
    for i in range(cfg.depth):
        h, gate = _block(h, params[f"blocks_{i}"], num_heads=cfg.num_heads,
                         tuning=tuning, select=select, mode=mode,
                         use_pallas=use_pallas, interpret=interpret,
                         gelu_approx=cfg.gelu_approx)
        if gate is not None:
            gates.append(gate.astype(jnp.float32))

    h = _ln(h, params["norm"])
    pooled = h[:, 0]
    logits = jnp.dot(pooled, params["head"]["kernel"],
                     preferred_element_type=jnp.float32) + params["head"]["bias"]
    gate_stack = jnp.stack(gates, axis=1) if gates else None
    return logits, gate_stack


def chunked_serving(fn, chunk: int = 128):
    """Wrap a batch-leading serving fn to process ``chunk`` images at a time
    INSIDE one jitted program (``lax.map`` over equal chunks + one tail call).

    Why: the monolithic big-batch program is measurably slower per image
    than chained 128-image chunks on TPU — the interleaved batch curve
    (scripts/diagnose_batch_dip.py, BENCH.md round 4) puts dispatch at
    5161 img/s for one b256 program vs 5488 when the same jit runs it as
    2x128 (b128 monolith: 5391).  Not an HBM-capacity effect (peak temp
    742 MB at b256) — the larger-shape program schedules worse than the
    chunk loop, so chunking is the serving operating envelope for b>128.

    ``fn`` maps ``[B, ...] -> pytree`` with every leaf batch-leading; the
    wrapper is shape-polymorphic over B and returns the same pytree.
    """
    def wrapped(x, *args, **kwargs):
        B = x.shape[0]
        if chunk <= 0 or B <= chunk:
            return fn(x, *args, **kwargs)
        n = B // chunk
        main = x[:n * chunk].reshape(n, chunk, *x.shape[1:])
        outs = jax.lax.map(lambda c: fn(c, *args, **kwargs), main)
        outs = jax.tree_util.tree_map(
            lambda o: o.reshape(n * chunk, *o.shape[2:]), outs)
        if B % chunk:
            tail = fn(x[n * chunk:], *args, **kwargs)
            outs = jax.tree_util.tree_map(
                lambda o, t: jnp.concatenate([o, t], axis=0), outs, tail)
        return outs
    return wrapped
