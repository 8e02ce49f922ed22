"""Synthetic-mIoU neutrality check for the opt-in narrow UPerHead.

`--seg_head_channels 256` is a documented DEVIATION from the reference
head config (channels=768, /root/reference/dense_tasks/Segmentation/
configs/beit/upernet/our_vit.py) that makes the full segmentor 2.59x
faster (BENCH.md round 3).  This script measures the other half of that
trade on the only data available in the sandbox: a synthetic oriented-
grating segmentation task at the real operating shape (ViT-B backbone,
512^2 crops, 8 classes), trained with the reference freeze rule (random
frozen backbone; adapters/router/rel-pos/FPN/heads train — so the decode
head must do the discriminative work, which is exactly the capacity
question the channel cut raises).

Classes differ by grating orientation/wavelength with random phase and
contrast per region plus pixel noise, so the head needs spatial context,
not per-pixel color matching.  Both arms run the same seeds, data stream
and iteration budget; report mIoU + pixel accuracy per arm.

This is NOT an ADE20K claim — it bounds the head-capacity effect on a
task of this difficulty only (real-data mIoU still needs real data;
ROADMAP.md).

Run (TPU): python scripts/validate_seg_head.py --iters 400 --seeds 2
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
import optax

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.upernet import DyTSegmentor, seg_loss
from dynamic_tuning_tpu.train.engine import create_train_state
from dynamic_tuning_tpu.train.optim import merge_params, partition_params
from dynamic_tuning_tpu.train.seg_runner import (poly_schedule,
                                                 seg_trainable_predicate)
from dynamic_tuning_tpu.utils.metrics import (confusion_matrix,
                                              miou_from_confusion)

SIZE = 512
NUM_CLASSES = 8


def _grating(angle, wavelength, phase, size=None):
    size = SIZE if size is None else size
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    t = (np.cos(angle) * xx + np.sin(angle) * yy) / wavelength
    return np.sin(2 * np.pi * t + phase)


class GratingTask:
    """8-class oriented-grating segmentation; rectangles of class-k
    texture over a class-0 background."""

    def __init__(self, seed):
        self.rs = np.random.RandomState(seed)
        self.angles = np.linspace(0, np.pi, NUM_CLASSES, endpoint=False)
        self.waves = 8.0 + 6.0 * np.arange(NUM_CLASSES)

    def sample(self, n):
        xs = np.empty((n, SIZE, SIZE, 3), np.float32)
        ys = np.empty((n, SIZE, SIZE), np.int32)
        for i in range(n):
            img = np.empty((SIZE, SIZE), np.float32)
            lab = np.zeros((SIZE, SIZE), np.int32)
            img[:] = _grating(self.angles[0], self.waves[0],
                              self.rs.uniform(0, 2 * np.pi))
            for _ in range(self.rs.randint(3, 7)):
                c = self.rs.randint(1, NUM_CLASSES)
                h = self.rs.randint(SIZE // 8, SIZE // 2)
                w = self.rs.randint(SIZE // 8, SIZE // 2)
                y0 = self.rs.randint(0, SIZE - h)
                x0 = self.rs.randint(0, SIZE - w)
                contrast = self.rs.uniform(0.6, 1.0)
                g = _grating(self.angles[c], self.waves[c],
                             self.rs.uniform(0, 2 * np.pi)) * contrast
                img[y0:y0 + h, x0:x0 + w] = g[y0:y0 + h, x0:x0 + w]
                lab[y0:y0 + h, x0:x0 + w] = c
            img = img + self.rs.randn(SIZE, SIZE).astype(np.float32) * 0.3
            xs[i] = img[..., None]
            ys[i] = lab
        return xs, ys


def run_arm(head_channels, seed, iters, batch, smoke=False):
    if smoke:
        cfg = ModelConfig(img_size=SIZE, num_classes=0, gelu_approx=True,
                          residual_dtype="bfloat16", embed_dim=64, depth=4,
                          num_heads=4)
    else:
        cfg = ModelConfig(img_size=SIZE, num_classes=0, gelu_approx=True,
                          residual_dtype="bfloat16")
    model = DyTSegmentor(cfg, num_classes=NUM_CLASSES, tuning=TuningConfig(),
                         select=SelectConfig(token_target_ratio=0.5),
                         head_channels=head_channels, dtype=jnp.bfloat16)
    task = GratingTask(seed=1000 + seed)
    rng = jax.random.PRNGKey(seed)
    x0, _ = task.sample(1)
    params = model.init(rng, jnp.asarray(x0))["params"]
    trainable, frozen = partition_params(params, seg_trainable_predicate)
    tx = optax.adamw(poly_schedule(1e-3, iters, warmup_iters=iters // 8),
                     weight_decay=0.05)
    state = create_train_state(trainable, frozen, tx,
                               jax.random.fold_in(rng, 1))

    @jax.jit
    def step(state, images, labels):
        def loss_fn(tr):
            p = merge_params(tr, state.frozen)
            r = jax.random.fold_in(state.rng, state.step)
            g, d = jax.random.split(r)
            logits, aux_logits, aux = model.apply(
                {"params": p}, images, training=True,
                rngs={"gate": g, "dropout": d})
            total, parts = seg_loss(logits, aux_logits, labels, aux["loss"])
            parts["loss"] = total
            return total, parts

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        return state._replace(
            step=state.step + 1,
            trainable=optax.apply_updates(state.trainable, updates),
            opt_state=opt_state), parts

    @jax.jit
    def infer(tr, fr, images):
        logits, _, _ = model.apply({"params": merge_params(tr, fr)}, images)
        return logits.argmax(-1).astype(jnp.int32)

    t0 = time.perf_counter()
    loss_first = loss_last = None
    for i in range(iters):
        xb, yb = task.sample(batch)
        state, parts = step(state, jnp.asarray(xb), jnp.asarray(yb))
        if i == 0:
            loss_first = float(parts["loss"])
    loss_last = float(parts["loss"])
    train_s = time.perf_counter() - t0

    ev = GratingTask(seed=9000 + seed)
    cm = np.zeros((NUM_CLASSES, NUM_CLASSES), np.int64)
    for _ in range(6):
        xb, yb = ev.sample(4)
        pred = np.asarray(infer(state.trainable, state.frozen,
                                jnp.asarray(xb)))
        cm += confusion_matrix(pred, yb, NUM_CLASSES)
    miou, _ = miou_from_confusion(cm)
    pixacc = float(np.diag(cm).sum() / cm.sum() * 100.0)
    return dict(head=head_channels or 768, seed=seed, miou=round(miou, 2),
                pix_acc=round(pixacc, 2), loss_first=round(loss_first, 3),
                loss_last=round(loss_last, 3), train_s=round(train_s, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny backbone + 64px crops on CPU (API check only)")
    args = ap.parse_args()
    if args.smoke:
        global SIZE
        SIZE = 64
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        args.iters, args.seeds, args.batch = 2, 1, 2

    results = []
    for seed in range(args.seeds):
        for head in (None, 256):   # interleaved: ref head, narrow head
            r = run_arm(head, seed, args.iters, args.batch,
                        smoke=args.smoke)
            results.append(r)
            print(json.dumps(r), flush=True)

    for head in (768, 256):
        mious = [r["miou"] for r in results if r["head"] == head]
        print(f"head {head}: mIoU {np.mean(mious):.2f} "
              f"(per-seed {mious})", flush=True)


if __name__ == "__main__":
    main()
