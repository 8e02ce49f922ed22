"""Diagnose the batch-256 serving dip (VERDICT r3 #8).

BENCH.md's r3 batch curve shows dispatch 5527 img/s @ b128 vs 5226 @ b256
(dense 4145 vs 4050).  That curve interleaved MODES within a batch size
(so dispatch/dense ratios are drift-free) but ran batch sizes
SEQUENTIALLY — a cross-batch comparison like 5527-vs-5226 is exposed to
chip-speed drift on the tunneled chip.  This script settles it:

  1. every (mode, batch) program is compiled first, then timed in
     round-robin rounds — b128 and b256 now share the same drift;
  2. ``compiled.memory_analysis()`` reports peak HBM per program (the
     "HBM pressure" hypothesis becomes a number, not a guess);
  3. a b256-split probe runs the same 256 images as two chained
     128-image forwards inside one jit (lax.map over 2 chunks) — if
     splitting recovers the b128 rate, the dip is scheduling/layout at
     the larger shape, not drift.

Run (TPU): python scripts/diagnose_batch_dip.py [--batches 64,128,192,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS, REPEATS = 20, 6


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,192,256")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16")
    sel = SelectConfig(token_target_ratio=0.5)
    dyt = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                            dtype=jnp.bfloat16)
    dense = VisionTransformer(cfg, tuning=TuningConfig(ffn_adapt=False),
                              select=SelectConfig(open=False),
                              dtype=jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(0), (2, 224, 224, 3),
                           jnp.float32)
    dyt_p = dyt.init(jax.random.PRNGKey(1), x2)["params"]
    dense_p = dense.init(jax.random.PRNGKey(1), x2)["params"]

    def make(model, batch, split=1, **kw):
        def one(p, xx):
            logits, _ = model.apply({"params": p}, xx, **kw)
            return logits.sum().astype(jnp.float32)

        @jax.jit
        def many(p, xx):
            def body(c, _):
                xp = xx + (c != 0).astype(xx.dtype)
                if split > 1:
                    parts = xp.reshape(split, batch // split,
                                       *xp.shape[1:])
                    s = jax.lax.map(lambda ch: one(p, ch), parts).sum()
                else:
                    s = one(p, xp)
                return s, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        return many

    progs = {}   # name -> (fn, params, x, batch)
    for b in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, 224, 224, 3),
                              jnp.float32)
        progs[f"dense_b{b}"] = (make(dense, b), dense_p, x, b)
        progs[f"dispatch_b{b}"] = (make(dyt, b, dispatch=True), dyt_p, x, b)
    bmax = max(batches)
    if bmax >= 256:
        x = jax.random.normal(jax.random.PRNGKey(0), (bmax, 224, 224, 3),
                              jnp.float32)
        progs[f"dispatch_b{bmax}_split2"] = (
            make(dyt, bmax, split=2, dispatch=True), dyt_p, x, bmax)

    mem = {}
    for name, (fn, p, x, b) in progs.items():
        lowered = fn.lower(p, x)
        comp = lowered.compile()
        try:
            ma = comp.memory_analysis()
            mem[name] = dict(
                peak_hbm_mb=round(getattr(ma, "temp_size_in_bytes", 0)
                                  / 2**20, 1),
                args_mb=round(getattr(ma, "argument_size_in_bytes", 0)
                              / 2**20, 1))
        except Exception:
            mem[name] = {}
        _ = float(fn(p, x))   # warm
        print(json.dumps({"compiled": name, **mem[name]}), flush=True)

    best = {k: float("inf") for k in progs}
    for r in range(REPEATS):
        for name, (fn, p, x, b) in progs.items():
            t0 = time.perf_counter()
            _ = float(fn(p, x))
            best[name] = min(best[name], (time.perf_counter() - t0) / ITERS)

    out = {}
    for name, (fn, p, x, b) in progs.items():
        out[name] = round(b / best[name], 1)
        print(json.dumps({name: {"ms": round(best[name] * 1e3, 3),
                                 "img_s": out[name]}}), flush=True)
    if "dispatch_b128" in out and f"dispatch_b{bmax}" in out:
        split_key = f"dispatch_b{bmax}_split2"
        print(json.dumps({
            f"dip_b{bmax}_vs_b128_dispatch": round(
                out[f"dispatch_b{bmax}"] / out["dispatch_b128"], 4),
            f"dip_b{bmax}_vs_b128_dense": round(
                out.get(f"dense_b{bmax}", 0) / out["dense_b128"], 4),
            "split2_recovery": round(
                out[split_key] / out[f"dispatch_b{bmax}"], 4)
            if split_key in out else None,
        }))


if __name__ == "__main__":
    main()
