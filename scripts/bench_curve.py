"""Throughput-vs-keep-ratio curve with the fused serving kernels.

Same protocol as bench.py (interleaved, best-of), one line per ratio.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH, WARM_ITERS, ITERS, REPEATS = 128, 1, 30, 4


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    quant = "int8" if "--quant" in sys.argv[1:] else "none"
    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16", quant=quant)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3),
                          jnp.float32)

    dense_model = VisionTransformer(cfg, tuning=TuningConfig(ffn_adapt=False),
                                    select=SelectConfig(open=False),
                                    dtype=jnp.bfloat16)
    dense_params = dense_model.init(jax.random.PRNGKey(1), x[:2])["params"]

    def compile_many(apply):
        @jax.jit
        def many(p, xx):
            def body(c, _):
                logits, _aux = apply(p, xx + (c != 0).astype(xx.dtype))
                return logits.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        return many

    dense_many = compile_many(
        lambda p, xx: dense_model.apply({"params": p}, xx))
    _ = float(dense_many(dense_params, x))

    runs = [("dense", dense_many, dense_params)]
    for ratio in (0.3, 0.5, 0.7, 0.9):
        m = VisionTransformer(cfg, tuning=TuningConfig(),
                              select=SelectConfig(token_target_ratio=ratio),
                              dtype=jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(1), x[:2])["params"]
        many = compile_many(
            lambda pp, xx, m=m: m.apply({"params": pp}, xx, dispatch=True))
        _ = float(many(p, x))
        runs.append((f"dyt_{ratio}", many, p))

    best = {name: float("inf") for name, _, _ in runs}
    for _ in range(REPEATS):
        for name, many, p in runs:
            t0 = time.perf_counter()
            _ = float(many(p, x))
            best[name] = min(best[name], time.perf_counter() - t0)
    dense_ips = BATCH * ITERS / best["dense"]
    out = {"dense_ips": round(dense_ips, 1)}
    for name in best:
        if name == "dense":
            continue
        ips = BATCH * ITERS / best[name]
        out[name] = {"ips": round(ips, 1), "vs_dense": round(ips / dense_ips, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
