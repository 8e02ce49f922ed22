"""DyT learning-dynamics validation (CPU-friendly).

Trains a small DyT ViT on a synthetic-but-learnable task and checks the
paper's core behaviors:
  * the budget loss pulls the train keep-rate to token_target_ratio;
  * the eval (sigmoid>0.5) keep-rate tracks the target;
  * capacity-dispatch eval accuracy matches mask eval accuracy;
  * classification loss decreases under distillation.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/validate_dynamics.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# run on CPU unless explicitly overridden (jax may be preloaded with an
# experimental backend in sandboxed environments; config.update works as long
# as no backend has been initialized yet)
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


def make_task(n=256, size=32, classes=10, seed=0):
    """Learnable synthetic task: class = dominant color patch pattern."""
    rs = np.random.RandomState(seed)
    protos = rs.randint(0, 256, (classes, size, size, 3)).astype(np.float32)
    labels = rs.randint(0, classes, n)
    imgs = protos[labels] + rs.randn(n, size, size, 3) * 20
    x = np.clip(imgs, 0, 255) / 127.5 - 1.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(labels)


def main(target=0.4, steps=300):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=4, num_heads=4)
    sel = SelectConfig(token_target_ratio=target)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=sel, dtype=jnp.float32)
    x, y = make_task()
    params = model.init(jax.random.PRNGKey(0), x[:2])["params"]
    tr, fr = partition_params(params)
    tx = make_optimizer(5e-3, warmup_epochs=1, epochs=30, steps_per_epoch=10)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))

    hist = []
    for i in range(steps):
        b = (i * 64) % 192
        state, parts = step(state, x[b:b + 64], y[b:b + 64])
        if i % 50 == 0 or i == steps - 1:
            hist.append({"step": i, "loss": round(float(parts["loss"]), 3),
                         "keep": round(float(parts["keep_ratio"]), 3)})
            print(json.dumps(hist[-1]), flush=True)

    ev_mask = jax.jit(make_eval_step(model_apply_fn(model)))
    ev_disp = jax.jit(make_eval_step(model_apply_fn(model), dispatch=True))
    xm, ym = x[192:], y[192:]
    lm, tsm = ev_mask(state.trainable, state.frozen, xm)
    ld, tsd = ev_disp(state.trainable, state.frozen, xm)
    acc_m = float((lm.argmax(-1) == ym).mean())
    acc_d = float((ld.argmax(-1) == ym).mean())
    out = {
        "final_train_keep": hist[-1]["keep"],
        "target": target,
        "eval_keep_mask": round(float(tsm.mean()), 3),
        "eval_keep_dispatch": round(float(tsd.mean()), 3),
        "holdout_acc_mask": round(acc_m, 3),
        "holdout_acc_dispatch": round(acc_d, 3),
        "loss_first": hist[0]["loss"], "loss_last": hist[-1]["loss"],
    }
    print(json.dumps(out))
    assert abs(out["final_train_keep"] - target) < 0.1, "keep-rate off target"
    assert out["loss_last"] < out["loss_first"], "loss did not decrease"
    assert abs(acc_m - acc_d) <= 0.05, "dispatch eval diverges from mask eval"
    print("DYNAMICS OK")
    return out


if __name__ == "__main__":
    main()
