"""Chunked-serving sweep: find the best chunk size for big-batch serving.

Follow-up to the batch-dip diagnosis (diagnose_batch_dip.py): chaining
128-image chunks inside one jit beat the monolithic b256 program AND the
b128 monolith.  This sweeps chunk sizes at a large serving batch (default
512) against the b128 monolith, all programs compiled first and timed
round-robin (drift-free), to pick the production chunk for
``fast_inference.chunked_serving``.

Run (TPU): python scripts/bench_chunked_serving.py [--batch 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS, REPEATS = 10, 6


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.fast_inference import chunked_serving
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chunks", default="64,128,256")
    args = ap.parse_args()

    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16")
    dyt = VisionTransformer(cfg, tuning=TuningConfig(),
                            select=SelectConfig(token_target_ratio=0.5),
                            dtype=jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(0), (2, 224, 224, 3),
                           jnp.float32)
    params = dyt.init(jax.random.PRNGKey(1), x2)["params"]

    def fwd(c, p):
        # returns batch-leading logits: chunked_serving requires every
        # output leaf to keep the batch dim (reduce AFTER the wrapper)
        logits, _ = dyt.apply({"params": p}, c, dispatch=True)
        return logits

    def make(batch, chunk):
        @jax.jit
        def many(p, xx):
            def body(carry, _):
                xp = xx + (carry != 0).astype(xx.dtype)
                if chunk and chunk < batch:
                    lo = chunked_serving(lambda cc: fwd(cc, p), chunk)(xp)
                else:
                    lo = fwd(xp, p)
                return lo.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        return many

    progs = {"b128_monolith": (make(128, 0), 128)}
    for c in [int(c) for c in args.chunks.split(",")]:
        progs[f"b{args.batch}_chunk{c}"] = (make(args.batch, c), args.batch)
    progs[f"b{args.batch}_monolith"] = (make(args.batch, 0), args.batch)

    xs = {b: jax.random.normal(jax.random.PRNGKey(0), (b, 224, 224, 3),
                               jnp.float32)
          for b in {128, args.batch}}
    for name, (fn, b) in progs.items():
        _ = float(fn(params, xs[b]))
        print(json.dumps({"compiled": name}), flush=True)

    best = {k: float("inf") for k in progs}
    for _ in range(REPEATS):
        for name, (fn, b) in progs.items():
            t0 = time.perf_counter()
            _ = float(fn(params, xs[b]))
            best[name] = min(best[name], (time.perf_counter() - t0) / ITERS)
    for name, (fn, b) in progs.items():
        print(json.dumps({name: {"ms": round(best[name] * 1e3, 3),
                                 "img_s": round(b / best[name], 1)}}),
              flush=True)


if __name__ == "__main__":
    main()
