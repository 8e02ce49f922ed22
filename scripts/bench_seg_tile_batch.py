"""Seg eval throughput vs --slide_tile_batch (crops/s, whole-image mIoU path).

Batch-1 window dispatch underutilizes the MXU on the 512^2 seg forward and
pays a tunnel round trip per tile; this measures the win from batching
window tiles per forward (models/upernet.py::slide_inference tile_batch).
Interleaves settings so chip drift cancels in the ratios.

Run (TPU): python scripts/bench_seg_tile_batch.py --sizes 512,683 --batches 1,2,4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,683",
                    help="comma-separated eval image sizes (H=W)")
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.upernet import DyTSegmentor, slide_inference

    if args.smoke:
        cfg = ModelConfig(img_size=64, patch_size=8, embed_dim=64, depth=4,
                          num_heads=4, num_classes=0)
        crop, stride, nc = 64, 48, 8
        tun = TuningConfig(ffn_num=8, d_model=64)
    else:
        cfg = ModelConfig(img_size=512, num_classes=0)   # ViT-B/16 backbone
        crop, stride, nc = 512, 341, 150
        tun = TuningConfig()
    seg = DyTSegmentor(cfg, num_classes=nc, tuning=tun, select=SelectConfig())
    x0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    params = {"params": seg.init(jax.random.PRNGKey(0), x0)["params"]}

    apply_fn = jax.jit(lambda v, t: seg.apply(v, t, training=False)[0])

    sizes = [int(s) for s in args.sizes.split(",")]
    tbs = [int(b) for b in args.batches.split(",")]
    rs = np.random.RandomState(0)
    imgs = {s: jnp.asarray(rs.randn(s, s, 3).astype(np.float32)) for s in sizes}

    # warm every (size, tb) combination first (compiles)
    for s in sizes:
        for tb in tbs:
            slide_inference(apply_fn, params, imgs[s], num_classes=nc,
                            crop=crop, stride=stride,
                            tile_batch=tb).block_until_ready()

    results = {}
    for s in sizes:
        n_tiles = None
        for _ in range(args.repeats):       # interleave tbs inside a repeat
            for tb in tbs:
                t0 = time.perf_counter()
                out = slide_inference(apply_fn, params, imgs[s],
                                      num_classes=nc, crop=crop,
                                      stride=stride, tile_batch=tb)
                out.block_until_ready()
                dt = time.perf_counter() - t0
                key = (s, tb)
                results[key] = min(results.get(key, float("inf")), dt)
    for (s, tb), dt in sorted(results.items()):
        base = results[(s, tbs[0])]
        print(json.dumps({"size": s, "tile_batch": tb,
                          "ms_per_image": round(dt * 1e3, 1),
                          "speedup_vs_tb1": round(base / dt, 3)}))


if __name__ == "__main__":
    main()
