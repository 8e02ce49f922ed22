"""A/B the selective score-remat mode against no-remat at big batches
(BENCH.md round-3: the batch>=128 train dip is activation pressure — the
two forwards' saved fp32 [B,H,N,N] score tensors are ~11 GB at batch 256,
forcing HBM spills; full-block remat over-corrects at +27-37%).

remat="scores" (ModelConfig) drops ONLY the checkpoint_name-tagged score/
prob tensors from the saved residuals: backward re-runs QK^T + softmax
from the saved q/k (~1/4 of the attention flops), keeping everything else.

Interleaved repeats (off/scores alternating in one session) so chip drift
cancels in the ratio.

Usage: python scripts/profile_train_remat.py [--quick]
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

TSTEPS = 8
REPEATS = 4


def build_step(remat, batch, sel):
    cfg = ModelConfig(num_classes=100, remat=remat)
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

    return lambda: float(steps_scan(state, x, y))


def _parse_mode(s):
    return {"off": False, "full": True}.get(s, s)


def main():
    """argv: pairs of batch:mode,mode (default '128:off,scores
    256:off,full' — the b256 scores program exceeds HBM, see
    profile_train_memory.py)."""
    specs = [a for a in sys.argv[1:] if ":" in a] or \
        ["128:off,scores", "256:off,full"]
    sel = SelectConfig(token_target_ratio=0.5)
    out = []
    for spec in specs:
        b_str, m_str = spec.split(":")
        batch = int(b_str)
        modes = [_parse_mode(m) for m in m_str.split(",")]
        runs = {m: build_step(m, batch, sel) for m in modes}
        for f in runs.values():
            f()                                     # compile + warm
        best = {m: float("inf") for m in runs}
        for _ in range(REPEATS):                    # interleaved A/B
            for m, f in runs.items():
                t0 = time.perf_counter()
                f()
                best[m] = min(best[m], (time.perf_counter() - t0) / TSTEPS)
        row = {"batch": batch}
        for m, s in best.items():
            key = {False: "off", True: "full"}.get(m, m)
            row[f"ms_{key}"] = round(s * 1e3, 1)
            row[f"img_s_{key}"] = round(batch / s, 1)
        if False in best:
            base = best[False]
            for m, s in best.items():
                if m is not False:
                    key = {True: "full"}.get(m, m)
                    row[f"speedup_{key}"] = round(base / s, 3)
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"rows": out}))


if __name__ == "__main__":
    main()
