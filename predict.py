"""Batch inference / serving entry point.

Classify images with a trained DyT checkpoint using the optimized
capacity-dispatch forward — the deployment-facing counterpart of the training
CLIs (no reference equivalent; the reference stops at eval loops).

Usage:
  python predict.py --ckpt final_checkpoint.msgpack --images dir_or_file \
      [--nb_classes 100] [--mode dispatch] [--batch_size 64]

Prints one JSON line per image: {"path", "label", "prob", "keep_ratio"}.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.data.transforms import augment_batch
from dynamic_tuning_tpu.models.fast_inference import fast_vit_forward
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train import checkpoint as C


def get_args_parser():
    p = argparse.ArgumentParser("DyT inference", add_help=False)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--nb_classes", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--mode", default="dispatch",
                   choices=["dispatch", "mask", "dense", "auto"],
                   help="auto = dense below the measured dispatch-crossover "
                        "batch size, dispatch at/above it (BENCH.md batch "
                        "curve: dispatch loses at batch 1, wins from ~8)")
    p.add_argument("--ffn_num", type=int, default=64)
    p.add_argument("--token_target_ratio", type=float, default=0.5)
    p.add_argument("--capacity_ratio", type=float, default=None)
    p.add_argument("--inception", action="store_true")
    # architecture overrides (default ViT-B/16 @ 224)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8_attn"],
                   help="int8 = W8A8 serving matmuls (ops/quant.py)")
    return p


def _list_images(path):
    if os.path.isfile(path):
        return [path]
    exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
    return [os.path.join(path, f) for f in sorted(os.listdir(path))
            if f.lower().endswith(exts)]


# Measured on TPU (scripts/bench_serving_batch_curve.py, BENCH.md round 3):
# below this batch the forward is latency-bound and the router + dispatch
# gather cost ~0.1 ms that token-skipping cannot pay back (0.92x at batch 1);
# the dispatch win crosses 1.0x at ~batch 8 and peaks at 128 (1.33x).
AUTO_DISPATCH_MIN_BATCH = 8


def _load_canvas(path, canvas=256):
    from dynamic_tuning_tpu.data.native_loader import available, decode_resize

    if available():
        img = decode_resize(path, canvas)
        if img is not None:
            return img
    from PIL import Image

    # same geometry as the native path (resize_center_crop): short side ->
    # canvas, center crop — NOT an aspect-destroying square stretch, which
    # would make predictions depend on whether the native lib compiled
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = canvas / min(w, h)
    img = img.resize((max(round(w * scale), canvas),
                      max(round(h * scale), canvas)), Image.BILINEAR)
    w, h = img.size
    left, top = (w - canvas) // 2, (h - canvas) // 2
    img = img.crop((left, top, left + canvas, top + canvas))
    return np.asarray(img, np.uint8)


def main(args):
    from dynamic_tuning_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = ModelConfig(num_classes=args.nb_classes, gelu_approx=True,
                      residual_dtype="bfloat16", img_size=args.img_size,
                      patch_size=args.patch_size, embed_dim=args.embed_dim,
                      depth=args.depth, num_heads=args.num_heads,
                      quant=args.quant)
    tuning = TuningConfig(ffn_num=args.ffn_num, d_model=args.embed_dim)
    sel = SelectConfig(token_target_ratio=args.token_target_ratio,
                       capacity_ratio=args.capacity_ratio)
    model = VisionTransformer(cfg, tuning=tuning, select=sel,
                              dtype=jnp.bfloat16)
    sample = jnp.zeros((1, args.img_size, args.img_size, 3))
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    if args.ckpt.endswith((".pth", ".pt")):
        params, _ = C.import_pretrained(params,
                                        C.load_torch_state_dict(args.ckpt))
    else:
        loaded = C.load_params(args.ckpt)
        params = loaded.get("params", loaded)

    if args.quant != "none":
        # int8 serving lives in the flax model's apply path (ops/quant.py);
        # fast_vit_forward never reads cfg.quant — routing it there would
        # silently serve bf16 labeled as W8A8
        from functools import partial

        @partial(jax.jit, static_argnames=("complete", "dispatch"))
        def flax_fwd(p, xb, complete, dispatch):
            logits, aux = model.apply({"params": p}, xb,
                                      complete_model=complete,
                                      dispatch=dispatch)
            return logits, aux["token_select"]

    paths = _list_images(args.images)
    canvas = max(int(args.img_size * 256 / 224), args.img_size)
    results = []

    # batches beyond 128 serve as chained 128-image chunks inside one
    # program: the monolithic big-batch jit is ~6% slower per image
    # (BENCH.md round-4 batch-dip diagnosis).  Wrappers are built ONCE per
    # serving mode (not per loop batch) so trace/compile caches hold.
    from dynamic_tuning_tpu.models.fast_inference import chunked_serving
    fwd_cache = {}

    def serving_fn(mode):
        if mode not in fwd_cache:
            if args.quant != "none":
                fwd_cache[mode] = chunked_serving(
                    lambda c: flax_fwd(params, c, complete=mode == "dense",
                                       dispatch=mode == "dispatch"))
            else:
                fwd_cache[mode] = chunked_serving(
                    lambda c: fast_vit_forward(params, c, cfg=cfg,
                                               tuning=tuning, select=sel,
                                               mode=mode, use_pallas=False))
        return fwd_cache[mode]

    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i:i + args.batch_size]
        imgs = np.stack([_load_canvas(p, canvas) for p in chunk])
        xb = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                           out_size=args.img_size, inception=args.inception,
                           train=False)
        mode = args.mode
        if mode == "auto":
            mode = ("dense" if len(chunk) < AUTO_DISPATCH_MIN_BATCH
                    else "dispatch")
        if args.quant != "none":
            logits, ts = serving_fn(mode)(xb)
            keep = (np.full(len(chunk), 1.0) if ts is None
                    else np.asarray(ts).mean(axis=(1, 2, 3)))
        else:
            logits, gates = serving_fn(mode)(xb)
            keep = (np.asarray(gates).mean(axis=(1, 2))
                    if gates is not None else np.full(len(chunk), 1.0))
        probs = jax.nn.softmax(logits, -1)
        for j, p in enumerate(chunk):
            r = {"path": p, "label": int(jnp.argmax(logits[j])),
                 "prob": round(float(probs[j].max()), 4),
                 "keep_ratio": round(float(keep[j]), 3)}
            results.append(r)
            print(json.dumps(r))
    return results


if __name__ == "__main__":
    main(get_args_parser().parse_args())
