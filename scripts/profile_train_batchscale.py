"""Is the train-throughput dip at batch >=128 real or chip drift?

Round-3 matrix measured 476/445/374 img/s at batch 64/128/256 — but the
three configs ran ~10 minutes apart on a drift-prone chip.  This script
compiles batch-64 and batch-256 step-scans ONCE, then interleaves their
timed repeats A/B/A/B so chip drift cancels out of the ratio
(CLAUDE.md measurement rule).

Hypothesis if real: fp32 attention-score activations saved for backward
(12 blocks x 2 forwards x B*12*197^2*4B = 5.7 GB at batch 256) pressure
HBM capacity/bandwidth.
"""

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

TSTEPS, REPEATS = 6, 4


def build(batch):
    cfg = ModelConfig(num_classes=100)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3))
    y = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    tr, fr = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=100)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
    base_step = make_train_step(model_apply_fn(model), tx, sel)

    @jax.jit
    def steps_scan(st, xx, yy):
        def body(s, _):
            s2, parts = base_step(s, xx, yy)
            return s2, parts["loss"]
        _, ls = jax.lax.scan(body, st, None, length=TSTEPS)
        return ls.sum()

    _ = float(steps_scan(state, x, y))
    return steps_scan, state, x, y


def main():
    sides = {b: build(b) for b in (64, 256)}
    best = {64: float("inf"), 256: float("inf")}
    for _ in range(REPEATS):
        for b, (fn, st, x, y) in sides.items():
            t0 = time.perf_counter()
            _ = float(fn(st, x, y))
            best[b] = min(best[b], time.perf_counter() - t0)
    out = {}
    for b in (64, 256):
        s = best[b] / TSTEPS
        out[f"b{b}_ms"] = round(s * 1e3, 2)
        out[f"b{b}_img_s"] = round(b / s, 1)
    out["img_s_ratio_b256_over_b64"] = round(
        out["b256_img_s"] / out["b64_img_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
