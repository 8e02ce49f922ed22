"""Full-model throughput across precision/gelu/dispatch configs (TPU)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer

B, ITERS = 128, 50


def bench(name, model, params, x, **apply_kw):
    def once(p, xx):
        logits, _ = model.apply({"params": p}, xx, **apply_kw)
        return logits.sum()

    @jax.jit
    def many(p, xx):
        def body(c, _):
            return once(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(params, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(many(params, x))
        best = min(best, time.perf_counter() - t0)
    ips = B * ITERS / best
    print(json.dumps({"name": name, "img_s": round(ips, 1),
                      "ms_per_batch": round(best / ITERS * 1e3, 2)}), flush=True)
    return ips


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.float32)
    sel = SelectConfig(token_target_ratio=0.5)

    results = {}
    for name, kw in [
        ("parity_fp32res_erf", dict(gelu_approx=False, residual_dtype="float32")),
        ("fast_bf16res_tanh", dict(gelu_approx=True, residual_dtype="bfloat16")),
    ]:
        cfg = ModelConfig(num_classes=100, **kw)
        model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                  dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
        results[f"dense_{name}"] = bench(f"dense_{name}", model, params, x,
                                         complete_model=True)
        results[f"dispatch_{name}"] = bench(f"dispatch_{name}", model, params,
                                            x, dispatch=True)
        results[f"mask_{name}"] = bench(f"mask_{name}", model, params, x)

    for k, v in results.items():
        print(k, round(v, 1))
    print("speedup parity:", round(results["dispatch_parity_fp32res_erf"]
                                   / results["dense_parity_fp32res_erf"], 3))
    print("speedup fast:", round(results["dispatch_fast_bf16res_tanh"]
                                 / results["dense_fast_bf16res_tanh"], 3))


if __name__ == "__main__":
    main()
