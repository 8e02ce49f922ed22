"""Fast-config convergence A/B (VERDICT r4 #6).

The +17.4% train lever (bf16 residual stream + tanh GELU;
scripts/bench_train_fastconfig.py) had its NUMERICS measured at random
init only.  This trains the parity config vs the fast config to
convergence on the synthetic-but-learnable image task (>=4 seeds, both
task and init vary per seed) and one video run, comparing final holdout
accuracy (mask eval AND capacity dispatch) and keep-rate convergence —
the evidence needed to recommend the knob for real runs.

Both arms use bf16 compute (the standard train dtype); they differ only
in the lever: parity = fp32 residual + exact erf GELU (the reference's
AMP contract, engine_finetune.py:47-65 autocast keeps the residual in
fp32), fast = bf16 residual + tanh GELU.

Run (CPU ok): python scripts/validate_fastconfig_convergence.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("DYT_VALIDATE_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_eval_step, make_train_step,
                                             model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params
from validate_dynamics import HOLDOUT

RATIO = 0.5
STEPS = 500


def make_task(n=256, size=32, classes=32, seed=0, noise=70.0):
    """validate_dynamics.make_task, harder (32 classes, sigma 70): final
    accuracy still saturates (a ViT memorizes any prototype task), so the
    A/B compares the CONVERGENCE TRAJECTORY — holdout accuracy at
    checkpoint steps — plus final loss and keep-rate convergence."""
    rs = np.random.RandomState(seed)
    protos = rs.randint(0, 256, (classes, size, size, 3)).astype(np.float32)
    labels = rs.randint(0, classes, n)
    imgs = protos[labels] + rs.randn(n, size, size, 3) * noise
    x = np.clip(imgs, 0, 255) / 127.5 - 1.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(labels)


CHECKPOINTS = (40, 80, 160, 320, STEPS)

ARMS = {
    "parity": dict(residual_dtype="float32", gelu_approx=False),
    "fast": dict(residual_dtype="bfloat16", gelu_approx=True),
}


def _acc(logits, y):
    return float((logits.argmax(-1) == y).mean())


def train_arm(arm, seed, video=False):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=32, embed_dim=64,
                      depth=4, num_heads=4, num_frames=2 if video else 1,
                      **ARMS[arm])
    tun = TuningConfig(ffn_num=8, d_model=64)
    sel = SelectConfig(token_target_ratio=RATIO)

    if video:
        from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

        def build(cap):
            return VideoVisionTransformer(
                cfg, tuning=tun,
                select=dataclasses.replace(sel, capacity_ratio=cap),
                dtype=jnp.bfloat16)
    else:
        def build(cap):
            return VisionTransformer(
                cfg, tuning=tun,
                select=dataclasses.replace(sel, capacity_ratio=cap),
                dtype=jnp.bfloat16)

    xi, y = make_task(seed=seed)
    if video:
        rs = np.random.RandomState(seed + 100)
        x = jnp.stack([xi, xi + jnp.asarray(
            rs.randn(*xi.shape).astype(np.float32) * 0.05)], axis=1)
    else:
        x = xi
    batch = 32 if video else 64

    model = build(None)
    params = model.init(jax.random.PRNGKey(seed), x[:2])["params"]
    if video:
        from dynamic_tuning_tpu.train.optim import default_trainable_predicate
        pred = lambda p: (default_trainable_predicate(p)
                          or p[0] in ("query_token", "attentive_blocks"))
        tr, fr = partition_params(params, pred)
    else:
        tr, fr = partition_params(params)
    tx = make_optimizer(5e-3, warmup_epochs=1, epochs=30,
                        steps_per_epoch=max(1, STEPS // 30))
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(seed + 1))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))
    eval_mask = jax.jit(make_eval_step(model_apply_fn(build(None))))
    n_train = x.shape[0] - HOLDOUT
    xh, yh = x[-HOLDOUT:], y[-HOLDOUT:]
    traj = {}
    for i in range(STEPS):
        b = (i * batch) % n_train
        state, parts = step(state, x[b:b + batch], y[b:b + batch])
        if i + 1 in CHECKPOINTS:
            lc, _ = eval_mask(state.trainable, state.frozen, xh)
            traj[f"acc@{i + 1}"] = round(_acc(lc, yh), 4)
    lm, tsm = eval_mask(state.trainable, state.frozen, xh)
    ld, _ = jax.jit(make_eval_step(model_apply_fn(build(RATIO)),
                                   dispatch=True))(
        state.trainable, state.frozen, xh)
    return dict(train_keep=round(float(parts["keep_ratio"]), 3),
                eval_keep=round(float(tsm.mean()), 3),
                acc_mask=round(_acc(lm, yh), 4),
                acc_dispatch=round(_acc(ld, yh), 4),
                loss_last=round(float(parts["loss"]), 4), **traj)


def main():
    rows = []
    for seed in range(4):
        for arm in ARMS:
            r = train_arm(arm, seed)
            rows.append(dict(family="image", seed=seed, arm=arm, **r))
            print(json.dumps(rows[-1]), flush=True)
    for arm in ARMS:
        r = train_arm(arm, 0, video=True)
        rows.append(dict(family="video", seed=0, arm=arm, **r))
        print(json.dumps(rows[-1]), flush=True)

    def mean(family, arm, key):
        vals = [r[key] for r in rows
                if r["family"] == family and r["arm"] == arm]
        return sum(vals) / len(vals)

    summary = {}
    keys = (["acc_mask", "acc_dispatch", "train_keep", "eval_keep"]
            + [f"acc@{c}" for c in CHECKPOINTS])
    for fam in ("image", "video"):
        for key in keys:
            summary[f"{fam}_{key}_delta_fast_minus_parity"] = round(
                mean(fam, "fast", key) - mean(fam, "parity", key), 4)
    image_accs = [r["acc_mask"] for r in rows if r["family"] == "image"]
    summary["image_acc_seed_spread"] = round(max(image_accs)
                                             - min(image_accs), 4)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
