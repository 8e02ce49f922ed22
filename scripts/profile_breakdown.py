"""Marginal-cost breakdown of the fast inference forward on TPU: time the
model with individual components ablated; differences = component cost."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models import fast_inference as FI
from dynamic_tuning_tpu.models.vit import VisionTransformer

B, ITERS = 128, 50
BF16 = jnp.bfloat16


def bench(name, forward, params, x):
    @jax.jit
    def many(p, xx):
        def body(c, _):
            return forward(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(params, x))
    best = min(_t(many, params, x) for _ in range(3))
    print(json.dumps({"name": name,
                      "ms_per_batch": round(best / ITERS * 1e3, 2),
                      "img_s": round(B * ITERS / best, 1)}), flush=True)


def _t(many, p, x):
    t0 = time.perf_counter()
    _ = float(many(p, x))
    return time.perf_counter() - t0


def build_forward(attn=True, mlp=True, adapter=True, router=True,
                  mode="mask", use_pallas=False, softmax=True):
    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16")
    tuning = TuningConfig()
    sel = SelectConfig()

    def fwd(params, x):
        ps = cfg.patch_size
        gh = gw = cfg.img_size // ps
        xb = x.astype(BF16).reshape(B, gh, ps, gw, ps, 3)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, ps * ps * 3)
        kern = params["patch_embed"]["proj"]["kernel"].astype(BF16).reshape(
            ps * ps * 3, -1)
        tok = jnp.dot(xb, kern, preferred_element_type=jnp.float32)
        tok = tok + params["patch_embed"]["proj"]["bias"]
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
        h = (jnp.concatenate([cls, tok], 1) + params["pos_embed"]).astype(BF16)

        for i in range(cfg.depth):
            p = params[f"blocks_{i}"]
            N, C = h.shape[1], h.shape[2]
            if attn:
                if softmax:
                    h = h + FI._attention(h, p, cfg.num_heads)
                else:  # attention matmuls without softmax (cost isolation)
                    hd = C // cfg.num_heads
                    qkv = FI._dense(FI._ln(h, p["norm1"]).astype(BF16),
                                    p["attn"]["qkv"]).astype(BF16)
                    qkv = qkv.reshape(B, N, 3, cfg.num_heads, hd)
                    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                    a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                   preferred_element_type=BF16)
                    o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
                    h = h + FI._dense(o, p["attn"]["proj"]).astype(BF16)
            if router:
                logits = FI._dense(h[:, 1:].astype(jnp.float32),
                                   p["mlp_token_select"]["mlp_head"])[..., 0]
                gate = jnp.concatenate(
                    [jnp.ones((B, 1), jnp.float32),
                     (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)], 1)
            else:
                gate = None
            a_out = FI._adapter(h, p["adaptmlp"], 0.1) if adapter else 0.0
            if mlp:
                mp, ln2 = p["mlp"], p["norm2"]
                g2 = (None if gate is None
                      else gate.reshape(B * N, 1).astype(h.dtype))
                if mode == "dispatch" and gate is not None:
                    from dynamic_tuning_tpu.ops.dispatch import (
                        capacity_for, gather_tokens, scatter_tokens,
                        select_topk)
                    K = capacity_for(N - 1, 0.5)
                    sc = jnp.concatenate(
                        [jnp.full((B, 1), jnp.inf, jnp.float32),
                         jax.nn.sigmoid(logits)], 1)
                    idx, mask = select_topk(sc, K)
                    xg = gather_tokens(h, idx).reshape(B * K, C)
                    if use_pallas:
                        from dynamic_tuning_tpu.ops.fused_mlp import fused_ln_mlp
                        yg = fused_ln_mlp(xg, ln2["scale"], ln2["bias"],
                                          mp["fc1"]["kernel"], mp["fc1"]["bias"],
                                          mp["fc2"]["kernel"], mp["fc2"]["bias"],
                                          mask.reshape(B * K, 1).astype(h.dtype),
                                          gelu_approx=True)
                    else:
                        from dynamic_tuning_tpu.ops.fused_mlp import ln_mlp_reference
                        yg = ln_mlp_reference(xg, ln2["scale"], ln2["bias"],
                                              mp["fc1"]["kernel"], mp["fc1"]["bias"],
                                              mp["fc2"]["kernel"], mp["fc2"]["bias"],
                                              mask.reshape(B * K, 1).astype(h.dtype),
                                              gelu_approx=True)
                    m_out = scatter_tokens(h, idx, yg.reshape(B, K, C), mask)
                else:
                    if use_pallas:
                        from dynamic_tuning_tpu.ops.fused_mlp import fused_ln_mlp
                        y = fused_ln_mlp(h.reshape(B * N, C), ln2["scale"],
                                         ln2["bias"], mp["fc1"]["kernel"],
                                         mp["fc1"]["bias"], mp["fc2"]["kernel"],
                                         mp["fc2"]["bias"], g2,
                                         gelu_approx=True)
                    else:
                        from dynamic_tuning_tpu.ops.fused_mlp import ln_mlp_reference
                        y = ln_mlp_reference(h.reshape(B * N, C), ln2["scale"],
                                             ln2["bias"], mp["fc1"]["kernel"],
                                             mp["fc1"]["bias"], mp["fc2"]["kernel"],
                                             mp["fc2"]["bias"], g2,
                                             gelu_approx=True)
                    m_out = y.reshape(B, N, C)
            else:
                m_out = 0.0
            h = h + (m_out if mlp else 0) + (a_out if adapter else 0)

        hf = FI._ln(h, params["norm"])
        return (jnp.dot(hf[:, 0], params["head"]["kernel"],
                        preferred_element_type=jnp.float32)
                + params["head"]["bias"]).sum()

    return fwd


def main():
    cfg = ModelConfig(num_classes=100)
    model = VisionTransformer(cfg, tuning=TuningConfig(),
                              select=SelectConfig(), dtype=BF16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]

    bench("full_mask", build_forward(), params, x)
    bench("no_attention", build_forward(attn=False), params, x)
    bench("attn_no_softmax", build_forward(softmax=False), params, x)
    bench("no_mlp", build_forward(mlp=False), params, x)
    bench("no_adapter", build_forward(adapter=False), params, x)
    bench("no_router", build_forward(router=False), params, x)
    bench("mask_pallas_mlp", build_forward(use_pallas=True), params, x)
    bench("dispatch_jnp", build_forward(mode="dispatch"), params, x)
    bench("dispatch_pallas", build_forward(mode="dispatch", use_pallas=True),
          params, x)


if __name__ == "__main__":
    main()
