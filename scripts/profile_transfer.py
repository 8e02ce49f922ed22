"""Attribute the train-LOOP vs device-step gap: host->device transfer.

bench_train_loop measured the Runner epoch loop at 0.26x the resident-
batch device rate (131 vs 507 img/s, batch 64).  The loop's only extra
work per step is ``Runner._device_batch``: a ``jnp.asarray`` upload of
the uint8 canvas batch (64x256x256x3 = 12.6 MB) plus the jitted on-device
augmentation.  This probe separates the candidates:

  1. resident-batch step rate (no transfer)        -> step_ms
  2. blocking device_put of one batch               -> put_ms, MB/s
  3. serialized loop: put + step every iteration    -> ser_ms
  4. threaded prefetch: a worker thread uploads batch i+1 while the main
     thread steps batch i                           -> ovl_ms

If ser_ms ~= step_ms + put_ms the gap is pure transfer time.  If
ovl_ms ~= max(step_ms, put_ms) the backend overlaps transfers with
compute and a prefetching runner recovers the difference; if
ovl_ms ~= ser_ms the tunnel serializes RPCs and prefetch cannot help
(production local-host PCIe does overlap — flax's prefetch_to_device
exists for exactly this).

Run (TPU): python scripts/profile_transfer.py --steps 30 --batch 64
"""
import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        # must run before anything can initialize the backend — the sandbox
        # preloads an axon TPU backend and platform selection only works
        # pre-initialization (CLAUDE.md)
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:
            print(f"WARNING: could not force CPU platform ({e}); "
                  f"smoke run may hit the TPU tunnel", file=sys.stderr)

    from dynamic_tuning_tpu.config import (DataConfig, ModelConfig,
                                           OptimConfig, RunConfig,
                                           SelectConfig, TuningConfig)
    from dynamic_tuning_tpu.train.runner import Runner

    if args.smoke:
        model = ModelConfig(img_size=32, patch_size=8, num_classes=10,
                            embed_dim=64, depth=2, num_heads=4)
        tuning = TuningConfig(ffn_num=8, d_model=64)
        args.steps = 4
    else:
        model = ModelConfig()
        tuning = TuningConfig()
    cfg = RunConfig(
        model=model, tuning=tuning, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=args.batch,
                        num_workers=2),
        output_dir="", compute_dtype="float32" if args.smoke else "bfloat16")
    r = Runner(cfg)
    host_batches = [b for b in r.train_loader][:4]
    nbytes = host_batches[0][0].nbytes

    # 1. resident step rate
    xb, yb = r._device_batch(*host_batches[0][:2], train=True)
    for _ in range(3):
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    step_ms = (time.perf_counter() - t0) / args.steps * 1e3

    # 2. blocking upload (raw bytes, no aug)
    imgs0 = host_batches[0][0]
    jax.block_until_ready(jax.device_put(imgs0))
    puts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(imgs0))
        puts.append(time.perf_counter() - t0)
    put_ms = min(puts) * 1e3
    mb_s = nbytes / 1e6 / (put_ms / 1e3)

    # 3. serialized put + step (block on the upload before stepping —
    # dispatch is async, so without the barrier batch i+1's transfer
    # overlaps step i and ser_ms understates the serialized cost)
    t0 = time.perf_counter()
    for i in range(args.steps):
        xb, yb = r._device_batch(*host_batches[i % 4][:2], train=True)
        jax.block_until_ready((xb, yb))
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    ser_ms = (time.perf_counter() - t0) / args.steps * 1e3

    # 4. threaded prefetch (depth 2)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def worker():
        for i in range(args.steps):
            q.put(r._device_batch(*host_batches[i % 4][:2], train=True))

    th = threading.Thread(target=worker, daemon=True)
    t0 = time.perf_counter()
    th.start()
    for _ in range(args.steps):
        xb, yb = q.get()
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    ovl_ms = (time.perf_counter() - t0) / args.steps * 1e3
    th.join()

    print(json.dumps({
        "batch": args.batch, "bytes_per_batch": nbytes,
        "step_ms": round(step_ms, 1), "put_ms": round(put_ms, 1),
        "upload_MB_s": round(mb_s, 1),
        "serialized_ms": round(ser_ms, 1),
        "overlapped_ms": round(ovl_ms, 1),
        "overlap_recovers": round(
            (ser_ms - ovl_ms) / max(ser_ms - max(step_ms, put_ms), 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
