"""Production train-LOOP throughput: the Runner's real epoch loop vs the
device-only step rate.

``profile_train.py`` / bench.py measure the jitted step inside a scan —
pure device time.  This script measures what a user actually gets from
``main_image.py``: the Runner epoch loop with data loading, host-side
augmentation dispatch, and metric materialization.  Over the tunneled chip
the old loop paid a blocking ~25 ms readback per step (float(parts) before
the next dispatch); the one-step-delayed flush (train/runner.py) keeps a
step in flight, so loop throughput should sit near the scan rate.

Run (TPU):  python scripts/bench_train_loop.py --steps 60 --batch 64
Compare:    loop_img_s vs scan_img_s (ratio ~1.0 = host fully hidden).

Reference comparator: engine_finetune.py:16-106's per-iter loop, which
synchronizes on loss.item() every step (misc.py MetricLogger) — the
behavior the delayed flush improves on.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--smoke", action="store_true", help="tiny model on CPU")
    args = ap.parse_args()

    from dynamic_tuning_tpu.config import (DataConfig, ModelConfig,
                                           OptimConfig, RunConfig,
                                           SelectConfig, TuningConfig)
    from dynamic_tuning_tpu.train.runner import Runner

    if args.smoke:
        model = ModelConfig(img_size=32, patch_size=8, num_classes=10,
                            embed_dim=64, depth=2, num_heads=4)
        tuning = TuningConfig(ffn_num=8, d_model=64)
    else:
        model = ModelConfig()                    # ViT-B/16 224
        tuning = TuningConfig()
    cfg = RunConfig(
        model=model, tuning=tuning, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=args.batch,
                        num_workers=4),
        output_dir="", compute_dtype="bfloat16" if not args.smoke
        else "float32")
    r = Runner(cfg)

    # -- loop rate: run the real epoch loop, time steps after warmup
    # (synthetic train split is 1024 samples; cycle its batches)
    pool = [b for b in r.train_loader]
    batches = [pool[i % len(pool)] for i in range(args.steps + 5)]

    def run_loop(bs):
        from dynamic_tuning_tpu.utils.meters import MetricLogger
        ml = MetricLogger()
        pending = None
        for imgs, labels in bs:
            xb, yb = r._device_batch(imgs, labels, train=True)
            r.state, parts = r.train_step(r.state, xb, yb)
            if pending is not None:
                ml.update(**{k: float(v) for k, v in pending.items()})
            pending = parts
        if pending is not None:
            ml.update(**{k: float(v) for k, v in pending.items()})
        jax.block_until_ready(r.state.step)

    run_loop(batches[:5])                        # compile + warm
    t0 = time.perf_counter()
    run_loop(batches[5:])
    dt_loop = time.perf_counter() - t0
    loop_img_s = args.batch * args.steps / dt_loop

    # -- device step rate: same step in a host loop with NO metric reads
    xb, yb = r._device_batch(*batches[0][:2], train=True)
    for _ in range(3):
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        r.state, _ = r.train_step(r.state, xb, yb)
    jax.block_until_ready(r.state.step)
    dt_dev = time.perf_counter() - t0
    dev_img_s = args.batch * args.steps / dt_dev

    print(json.dumps({
        "batch": args.batch, "steps": args.steps,
        "loop_img_s": round(loop_img_s, 1),
        "device_img_s": round(dev_img_s, 1),
        "loop_vs_device": round(loop_img_s / dev_img_s, 3),
    }))


if __name__ == "__main__":
    main()
