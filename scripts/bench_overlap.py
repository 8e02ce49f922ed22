"""Overlapped input-pipeline bench: loader + H2D + jitted train step
CONCURRENTLY (VERDICT r4 #3b) — does the host pipeline feed the chip?

Drives the REAL Runner epoch loop (train/runner.py pipelines one step in
flight: host decode/aug overlaps device compute) over three data sources:

  synthetic   — in-memory uint8 canvases: the pure device-rate ceiling
  jpeg_small  — tiny on-disk JPEGs (decode >> device rate): sustained must
                match the synthetic rate, proving the loader hides behind
                the device when it has headroom
  jpeg_rich   — realistic 500x375 q85 JPEGs (ImageNet-ish; on this 1-core
                sandbox the decode ceiling is BELOW the device rate):
                sustained must match the LOADER-ONLY rate, proving the
                pipeline degrades to max(loader, device) — true overlap —
                not to the serial 1/(1/L + 1/D)

Loader-only rates for both JPEG sets are measured in the same session.
The reference's answer to the same problem is num_workers=10 per rank
(/root/reference/main_image.py:169-183); ours is the native C++ decode
pool + the one-step-in-flight device loop.

Host arithmetic for pod scale is in BENCH.md (per-core decode rate x host
cores vs chips x device rate).

Run (TPU): python scripts/bench_overlap.py [--n 2048 --batch 64]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpeg_tree(root: str, n: int, hw, quality: int, classes: int = 10):
    from PIL import Image

    rs = np.random.RandomState(0)
    base = rs.randint(0, 256, (*hw, 3), np.uint8)
    for i in range(n):
        d = os.path.join(root, "train", f"class{i % classes}")
        os.makedirs(d, exist_ok=True)
        arr = np.roll(base, i * 7, axis=1)  # vary content: no decode caching
        Image.fromarray(arr).save(os.path.join(d, f"im{i}.jpg"),
                                  quality=quality)
    # minimal val split so build_image_dataset succeeds
    for c in range(classes):
        d = os.path.join(root, "val", f"class{c}")
        os.makedirs(d, exist_ok=True)
        Image.fromarray(base[:64, :64]).save(os.path.join(d, "im0.jpg"),
                                             quality=quality)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    import jax

    from dynamic_tuning_tpu.config import (DataConfig, ModelConfig,
                                           OptimConfig, RunConfig,
                                           SelectConfig, TuningConfig)
    from dynamic_tuning_tpu.train.runner import Runner

    root = tempfile.mkdtemp(prefix="dyt_overlap_")
    print(json.dumps({"backend": jax.default_backend(),
                      "host_cores": os.cpu_count()}), flush=True)
    make_jpeg_tree(os.path.join(root, "jpeg_rich"), args.n, (375, 500), 85)
    make_jpeg_tree(os.path.join(root, "jpeg_small"), args.n, (64, 64), 85)

    def loader_only(name):
        from dynamic_tuning_tpu.data.datasets import build_image_dataset
        from dynamic_tuning_tpu.data.loader import make_loader

        train, _, _, _ = build_image_dataset(name, root)
        dl = make_loader(train, args.batch, shuffle=True, drop_last=True,
                         num_workers=args.workers)
        best = 0.0
        for _ in range(2):
            dl.set_epoch(0)
            t0 = time.perf_counter()
            n = sum(b[1].shape[0] for b in dl)
            best = max(best, n / (time.perf_counter() - t0))
        return best

    out = {"loader_only": {n: round(loader_only(n), 1)
                           for n in ("jpeg_rich", "jpeg_small")}}
    print(json.dumps({"loader_only": out["loader_only"]}), flush=True)

    def overlapped(dataset):
        cfg = RunConfig(
            model=ModelConfig(num_classes=100),    # full ViT-B/16 224^2
            tuning=TuningConfig(), select=SelectConfig(),
            optim=OptimConfig(lr=1e-3, warmup_epochs=0, epochs=3),
            data=DataConfig(dataset=dataset, data_path=root,
                            batch_size=args.batch,
                            num_workers=args.workers),
            output_dir="", compute_dtype="bfloat16")
        r = Runner(cfg)
        nb = len(r.train_loader) * args.batch
        r.train_one_epoch(0)                       # compile + loader warmup
        t0 = time.perf_counter()
        r.train_one_epoch(1)
        dt = time.perf_counter() - t0
        return nb / dt

    for name in ("synthetic", "jpeg_small", "jpeg_rich"):
        rate = overlapped(name)
        out[name] = round(rate, 1)
        print(json.dumps({name: out[name]}), flush=True)

    serial = 1.0 / (1.0 / out["loader_only"]["jpeg_rich"]
                    + 1.0 / out["synthetic"])
    print(json.dumps({
        "device_rate": out["synthetic"],
        "sustained_fast_loader": out["jpeg_small"],
        "sustained_slow_loader": out["jpeg_rich"],
        "loader_rate_rich": out["loader_only"]["jpeg_rich"],
        "serial_composition_would_be": round(serial, 1),
        "overlap_efficiency_fast": round(out["jpeg_small"]
                                         / out["synthetic"], 3),
        "overlap_efficiency_slow": round(
            out["jpeg_rich"] / min(out["loader_only"]["jpeg_rich"],
                                   out["synthetic"]), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
