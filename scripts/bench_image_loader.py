"""Image decode-pipeline throughput: native C++ loader vs Python DataLoader.

Generates realistic-size JPEGs (500x375, quality 85 — ImageNet-ish), then
measures steady-state img/s through both loader backends with identical
canvas geometry (PIL-bicubic parity resampler on both sides).

Run: python scripts/bench_image_loader.py --n 512 --workers 8
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--canvas", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    from dynamic_tuning_tpu.data import native_loader as NL
    from dynamic_tuning_tpu.data.datasets import decode_canvas
    from dynamic_tuning_tpu.data.loader import DataLoader

    d = tempfile.mkdtemp(prefix="dyt_loader_bench_")
    rs = np.random.RandomState(0)
    samples = []
    base = rs.randint(0, 256, (375, 500, 3), np.uint8)
    for i in range(args.n):
        # vary content a little so JPEG work isn't trivially cached
        arr = np.roll(base, i * 7, axis=1)
        p = os.path.join(d, f"im{i}.jpg")
        Image.fromarray(arr).save(p, quality=85)
        samples.append((p, i % 100))

    def run(loader, label):
        best = 0.0
        for _ in range(args.epochs):
            loader.set_epoch(0)
            t0 = time.perf_counter()
            n = sum(b[1].shape[0] for b in loader)
            rate = n / (time.perf_counter() - t0)
            best = max(best, rate)
        print(f"{label:28s} {best:8.1f} img/s")
        return best

    class _FileDS:
        def __init__(self, samples, canvas):
            self.samples, self.canvas = samples, canvas

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            p, y = self.samples[i]
            return decode_canvas(p, self.canvas), y

    native = NL.NativeDataLoader(samples, args.batch, canvas=args.canvas,
                                 num_workers=args.workers)
    py = DataLoader(_FileDS(samples, args.canvas), args.batch,
                    num_workers=args.workers)
    rn = run(native, f"native C++ ({args.workers} thr)")
    rp = run(py, f"python/PIL ({args.workers} thr)")
    print(f"native vs python: {rn / rp:.2f}x")


if __name__ == "__main__":
    main()
