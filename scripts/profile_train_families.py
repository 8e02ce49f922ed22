"""Train-path measurement for the video and segmentation families (the
round-3 train table covered images only).  Same scan-rolled protocol as
scripts/profile_train.py: TSTEPS full train steps inside one jitted
program, best-of-REPEATS, so numbers are pure device time.

* video: VideoVisionTransformer ViT-B, 16 clips x 8 frames @224 (the
  reference K400 recipe's per-GPU batch, main_video.py) — student +
  teacher + 4-term loss + backward + AdamW via the shared engine.
* seg: DyTSegmentor (windowed rel-pos backbone + UPerHead + aux FCN),
  batch 2 x 512^2 crops (reference samples_per_gpu=2, poly AdamW) —
  single pass + seg_loss + backward.

Achieved TFLOPS comes from XLA's own cost analysis (a lax.scan body is
counted ONCE — verified round 3 — so the program count IS the per-step
count, no TSTEPS division).  MFU is vs the same-session ambient
matmul rate so external throttling shows up in the ambient, not the MFU.

Usage: python scripts/profile_train_families.py [video|seg ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params
from scripts.bench_util import ambient_tflops  # noqa: E402

TSTEPS = 4
REPEATS = 4


def _time_scan(step_fn, state, x, y):
    """(s/step, flops/step) for a (state, x, y) -> (state, scalar) step."""

    @jax.jit
    def steps_scan(st, xx, yy):
        def body(s, _):
            s2, val = step_fn(s, xx, yy)
            return s2, val
        _, ls = jax.lax.scan(body, st, None, length=TSTEPS)
        return ls.sum()

    lowered = steps_scan.lower(state, x, y)
    compiled = lowered.compile()
    try:
        # XLA cost_analysis counts a scan/while body ONCE (verified in
        # profile_train.py), so this is already flops per step.
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = None
    _ = float(compiled(state, x, y))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(compiled(state, x, y))
        best = min(best, (time.perf_counter() - t0) / TSTEPS)
    return best, flops


def video_row(amb):
    clips, frames = 16, 8
    cfg = ModelConfig(num_classes=400, num_frames=frames)
    sel = SelectConfig(token_target_ratio=0.5)
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer
    model = VideoVisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                   dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (clips, frames, 224, 224, 3))
    y = jnp.zeros((clips,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:1])["params"]
    from dynamic_tuning_tpu.train.video_runner import VideoRunner
    tr, fr = partition_params(params, VideoRunner._trainable_pred)
    tx = make_optimizer(1e-3, steps_per_epoch=100)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
    step = make_train_step(model_apply_fn(model), tx, sel)

    def wrapped(st, xx, yy):
        st2, parts = step(st, xx, yy)
        return st2, parts["loss"]

    s, flops = _time_scan(wrapped, state, x, y)
    row = {"family": "video", "batch_clips": clips, "frames": frames,
           "ms_per_step": round(s * 1e3, 1),
           "clips_s": round(clips / s, 1)}
    if flops:
        row["tflops_xla_count"] = round(flops / s / 1e12, 1)
        if amb:
            row["mfu_vs_ambient"] = round(flops / s / 1e12 / amb, 3)
    return row


def seg_row(amb):
    batch, crop = 2, 512
    cfg = ModelConfig(num_classes=150, img_size=crop)
    sel = SelectConfig(token_target_ratio=0.5)
    from dynamic_tuning_tpu.models.upernet import DyTSegmentor, seg_loss
    from dynamic_tuning_tpu.train.optim import merge_params
    from dynamic_tuning_tpu.train.seg_runner import seg_trainable_predicate
    model = DyTSegmentor(cfg, num_classes=150, tuning=TuningConfig(),
                         select=sel, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, crop, crop, 3))
    y = jnp.zeros((batch, crop, crop), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:1])["params"]
    tr, fr = partition_params(params, seg_trainable_predicate)
    tx = optax.adamw(1e-3, weight_decay=0.05)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))

    def loss_fn(trainable, frozen, images, labels, rngs):
        p = merge_params(trainable, frozen)
        logits, aux_logits, aux = model.apply({"params": p}, images,
                                              training=True, rngs=rngs)
        total, _ = seg_loss(logits, aux_logits, labels, aux["loss"])
        return total

    def wrapped(st, xx, yy):
        r = jax.random.fold_in(st.rng, st.step)
        g, d = jax.random.split(r)
        loss, grads = jax.value_and_grad(loss_fn)(
            st.trainable, st.frozen, xx, yy, {"gate": g, "dropout": d})
        updates, opt_state = tx.update(grads, st.opt_state, st.trainable)
        trainable = optax.apply_updates(st.trainable, updates)
        return st._replace(trainable=trainable, opt_state=opt_state,
                           step=st.step + 1), loss

    s, flops = _time_scan(wrapped, state, x, y)
    row = {"family": "seg", "batch": batch, "crop": crop,
           "ms_per_step": round(s * 1e3, 1),
           "crops_s": round(batch / s, 1)}
    if flops:
        row["tflops_xla_count"] = round(flops / s / 1e12, 1)
        if amb:
            row["mfu_vs_ambient"] = round(flops / s / 1e12 / amb, 3)
    return row


def main():
    fams = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["video", "seg"]
    amb = ambient_tflops()
    print(f"ambient bf16 matmul: {amb}", flush=True)
    for fam in fams:
        row = (video_row if fam == "video" else seg_row)(amb)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
