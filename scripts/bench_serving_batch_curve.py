"""Serving latency/throughput vs batch size — the production-serving view
the fixed-batch-128 headline doesn't show.

For each batch in {1, 8, 32, 128, 256} x mode in {dense, dispatch,
dispatch-int8}: scan-rolled device time per forward (same protocol as
bench.py / bench_curve.py — ITERS chained iterations inside one program,
one scalar readback, immune to the tunnel's ~25 ms RTT), reported as
per-batch latency (ms) and img/s.  Modes are interleaved per batch size
so chip drift cancels in the ratios.

Usage: python scripts/bench_serving_batch_curve.py [batches...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS, REPEATS = 30, 4


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 32, 128, 256]

    def compile_many(apply):
        @jax.jit
        def many(p, xx):
            def body(c, _):
                logits = apply(p, xx + (c != 0).astype(xx.dtype))
                return logits.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        return many

    sel = SelectConfig(token_target_ratio=0.5)
    for batch in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3),
                              jnp.float32)
        runs = {}
        for mode in ("dense", "dispatch", "int8"):
            cfg = ModelConfig(num_classes=100, gelu_approx=True,
                              residual_dtype="bfloat16",
                              quant="int8" if mode == "int8" else "none")
            if mode == "dense":
                m = VisionTransformer(cfg, tuning=TuningConfig(ffn_adapt=False),
                                      select=SelectConfig(open=False),
                                      dtype=jnp.bfloat16)
                apply = lambda p, xx, m=m: m.apply({"params": p}, xx)[0]
            else:
                m = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                      dtype=jnp.bfloat16)
                apply = lambda p, xx, m=m: m.apply({"params": p}, xx,
                                                   dispatch=True)[0]
            params = m.init(jax.random.PRNGKey(1), x[:1])["params"]
            fn = compile_many(apply)
            _ = float(fn(params, x))                    # compile + warm
            runs[mode] = (fn, params)
        best = {k: float("inf") for k in runs}
        for _ in range(REPEATS):                        # interleaved
            for k, (fn, params) in runs.items():
                t0 = time.perf_counter()
                _ = float(fn(params, x))
                best[k] = min(best[k], (time.perf_counter() - t0) / ITERS)
        row = {"batch": batch}
        for k, s in best.items():
            row[f"ms_{k}"] = round(s * 1e3, 3)
            row[f"img_s_{k}"] = round(batch / s, 1)
        row["dispatch_vs_dense"] = round(best["dense"] / best["dispatch"], 3)
        row["int8_vs_dense"] = round(best["dense"] / best["int8"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
