"""Full DyT train-step throughput on TPU (student+teacher fwd, 4-term loss,
backward, AdamW) at ViT-B scale."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params

B = 64
STEPS = 20


def main():
    cfg = ModelConfig(num_classes=100)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3))
    y = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    tr, fr = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=100)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel),
                   donate_argnums=(0,))

    # two warm steps: the first donated-buffer dispatch triggers a second
    # (slow, remote) compile on the tunneled chip
    for _ in range(2):
        state, parts = step(state, x, y)
        jax.block_until_ready(parts["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, parts = step(state, x, y)
    _ = float(parts["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({"train_img_s": round(B * STEPS / dt, 1),
                      "ms_per_step": round(dt / STEPS * 1e3, 2),
                      "batch": B, "loss": float(parts["loss"])}))


if __name__ == "__main__":
    main()
