"""End-task accuracy across serving modes at full ViT-B/16 scale.

Round 3 pinned the serving variants at the LOGIT level against a torch
oracle (bf16 2.6e-2 argmax-preserving; int8 6e-2, softmax-prob L1 0.015
— tests/test_full_scale_vit.py).  This script measures what those deltas
cost on an END TASK: train a real DyT model (adapters + router + head on
a frozen ViT-B backbone, the reference freeze rule, full student/teacher
4-term loss) on a synthetic 10-class oriented-grating task at 224^2,
then evaluate the SAME trained params through every serving path:

    fp32 mask (reference semantics)  <- accuracy anchor
    bf16 mask (XLA serving)
    bf16 + fused Pallas kernels (production serving)
    capacity dispatch (exact ratio)
    int8 W8A8
    int8 + dispatch

reporting top-1 accuracy, argmax agreement vs the fp32 anchor, and mean
|delta softmax prob|.  Gratings have random phase per region so the task
needs orientation/frequency discrimination, not color memorization.

Run (TPU): python scripts/validate_serving_accuracy.py --steps 300
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_eval_step, make_train_step,
                                             model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params

SIZE = 224
CLASSES = 10


def make_gratings(n, seed, noise=0.4):
    """10-class oriented gratings, random phase/contrast + pixel noise.

    ``noise`` sets difficulty: 0.4 is easy (ViT-B saturates it), ~3-4
    pushes holdout accuracy off the ceiling so serving-mode deltas can
    flip marginal samples — the adversarial version of the check."""
    rs = np.random.RandomState(seed)
    angles = np.linspace(0, np.pi, CLASSES, endpoint=False)
    waves = 8.0 + 4.0 * np.arange(CLASSES)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    xs = np.empty((n, SIZE, SIZE, 3), np.float32)
    ys = rs.randint(0, CLASSES, n).astype(np.int32)
    for i in range(n):
        c = ys[i]
        t = (np.cos(angles[c]) * xx + np.sin(angles[c]) * yy) / waves[c]
        g = np.sin(2 * np.pi * t + rs.uniform(0, 2 * np.pi))
        g = g * rs.uniform(0.6, 1.0) + rs.randn(SIZE, SIZE) * noise
        xs[i] = g.astype(np.float32)[..., None]
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--holdout", type=int, default=512)
    ap.add_argument("--ratio", type=float, default=0.5)
    ap.add_argument("--noise", type=float, default=0.4)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + 32px on CPU (API check only)")
    args = ap.parse_args()
    fused_on = "1"
    if args.smoke:
        global SIZE
        SIZE = 32
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        args.steps, args.batch, args.holdout = 3, 8, 32
        fused_on = "interpret"

    tuning = (TuningConfig(ffn_num=8, d_model=64) if args.smoke
              else TuningConfig())
    sel = SelectConfig(token_target_ratio=args.ratio)

    def build(dtype, quant="none", cap=None):
        if args.smoke:
            cfg = ModelConfig(img_size=SIZE, patch_size=8,
                              num_classes=CLASSES, embed_dim=64, depth=2,
                              num_heads=4, quant=quant)
        else:
            cfg = ModelConfig(num_classes=CLASSES, quant=quant)
        return VisionTransformer(
            cfg, tuning=tuning,
            select=SelectConfig(token_target_ratio=args.ratio,
                                capacity_ratio=cap),
            dtype=dtype)

    # ---- train (reference freeze rule, full 4-term loss) ----
    train_model = build(jnp.bfloat16)
    params = train_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, SIZE, SIZE, 3)))["params"]
    trainable, frozen = partition_params(params)
    tx = make_optimizer(1e-3, epochs=100, warmup_epochs=5,
                        steps_per_epoch=max(args.steps // 10, 1))
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model_apply_fn(train_model), tx, sel),
                   donate_argnums=(0,))

    pool_x, pool_y = make_gratings(2048, seed=5, noise=args.noise)
    for i in range(args.steps):
        b = (i * args.batch) % (2048 - args.batch + 1)
        state, parts = step(state, jnp.asarray(pool_x[b:b + args.batch]),
                            jnp.asarray(pool_y[b:b + args.batch]))
        if i % 50 == 0:
            print(f"step {i}: loss {float(parts['loss']):.3f} "
                  f"keep {float(parts['keep_ratio']):.3f}", flush=True)

    hx, hy = make_gratings(args.holdout, seed=77, noise=args.noise)
    hx = jnp.asarray(hx)

    # ---- eval the same params through every serving path ----
    def probs_for(dtype, quant="none", cap=None, dispatch=False, fused="0"):
        os.environ["DYT_FUSED_ATTN"] = fused
        m = build(dtype, quant=quant, cap=cap)
        ev = jax.jit(make_eval_step(model_apply_fn(m), dispatch=dispatch))
        out = []
        for b in range(0, hx.shape[0], 128):
            logits, _ = ev(state.trainable, state.frozen, hx[b:b + 128])
            out.append(np.asarray(
                jax.nn.softmax(logits.astype(jnp.float32), -1)))
        return np.concatenate(out)

    variants = [
        ("fp32_mask", dict(dtype=jnp.float32)),
        ("bf16_mask", dict(dtype=jnp.bfloat16)),
        ("bf16_fused", dict(dtype=jnp.bfloat16, fused=fused_on)),
        ("dispatch", dict(dtype=jnp.bfloat16, cap=args.ratio, dispatch=True,
                          fused=fused_on)),
        ("int8", dict(dtype=jnp.bfloat16, quant="int8", fused=fused_on)),
        ("int8_dispatch", dict(dtype=jnp.bfloat16, quant="int8",
                               cap=args.ratio, dispatch=True,
                               fused=fused_on)),
    ]
    anchor = None
    for name, kw in variants:
        p = probs_for(**kw)
        if anchor is None:
            anchor = p
        acc = float((p.argmax(-1) == hy).mean())
        agree = float((p.argmax(-1) == anchor.argmax(-1)).mean())
        dprob = float(np.abs(p - anchor).mean())
        print(json.dumps(dict(variant=name, acc=round(acc, 4),
                              agree_vs_fp32=round(agree, 4),
                              mean_dprob=round(dprob, 5))), flush=True)


if __name__ == "__main__":
    main()
