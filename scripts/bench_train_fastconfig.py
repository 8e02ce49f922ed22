"""Re-measure the train fast-config lever (ROADMAP "Remaining levers"):
bf16 residual stream + tanh GELU vs the default AMP-parity config
(fp32 residual, exact erf GELU), at the b64 train operating point.

Round-1 measured ~+19% for the combo; this re-measures each knob
separately on the current engine (scan-rolled steps, interleaved
round-robin so all four programs share the same chip drift), and
quantifies the numerics cost as the full-shape train-mode logit delta
vs the default config (same params, same gate RNG).

Usage: python scripts/bench_train_fastconfig.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params
from scripts.bench_util import ambient_tflops

TSTEPS = 8
ROUNDS = 5
BATCH = 64

CONFIGS = [
    ("default (fp32 res, erf gelu)", {}),
    ("bf16 residual", {"residual_dtype": "bfloat16"}),
    ("tanh gelu", {"gelu_approx": True}),
    ("fast (bf16 res + tanh gelu)", {"residual_dtype": "bfloat16",
                                     "gelu_approx": True}),
]


def build(cfg_kw):
    cfg = ModelConfig(num_classes=100, **cfg_kw)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel)
    return model, sel


def make_scan(model, sel, x, y):
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

    _ = float(steps_scan(state, x, y))  # compile + warm
    return steps_scan, state


def main():
    amb = ambient_tflops()
    print(f"ambient bf16 matmul: "
          f"{'unmeasurable' if amb is None else f'{amb:.1f}'} TFLOPS",
          flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3))
    y = jnp.zeros((BATCH,), jnp.int32)

    progs = []
    for name, kw in CONFIGS:
        model, sel = build(kw)
        fn, st = make_scan(model, sel, x, y)
        progs.append((name, fn, st))
        print(f"compiled: {name}", flush=True)

    best = {name: float("inf") for name, _, _ in progs}
    for _ in range(ROUNDS):
        for name, fn, st in progs:
            t0 = time.perf_counter()
            _ = float(fn(st, x, y))
            best[name] = min(best[name], time.perf_counter() - t0)

    base = best[CONFIGS[0][0]] / TSTEPS
    print(f"\ntrain step b{BATCH} (scan-rolled, best of {ROUNDS} "
          f"interleaved rounds):")
    for name, _, _ in progs:
        s = best[name] / TSTEPS
        print(f"  {name:34s} {s*1e3:7.2f} ms/step  {BATCH/s:7.1f} img/s  "
              f"({base/s:5.3f}x vs default)")

    # numerics cost: train-mode student logit delta vs default, same
    # params + gate noise (fast-config params are a superset-compatible
    # tree: same structure, only compute dtypes differ)
    ref_model, _ = build(CONFIGS[0][1])
    params = ref_model.init(jax.random.PRNGKey(1), x[:2])["params"]
    rngs = {"gate": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}

    def logits_of(kw):
        model, _ = build(kw)
        out, _aux = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx, training=True,
                                      rngs=rngs))(params, x)
        return np.asarray(out, np.float32)

    ref = logits_of(CONFIGS[0][1])
    sm_ref = jax.nn.softmax(ref, axis=-1)
    print("\ntrain-mode logit deltas vs default (b64, ViT-B 224^2):")
    for name, kw in CONFIGS[1:]:
        lg = logits_of(kw)
        sm = jax.nn.softmax(lg, axis=-1)
        l1 = float(jnp.abs(sm - sm_ref).sum(-1).mean())
        agree = float((lg.argmax(-1) == ref.argmax(-1)).mean())
        print(f"  {name:34s} max|dlogit| {np.abs(lg-ref).max():.4f}  "
              f"softmax L1 {l1:.5f}  argmax agree {agree:.3f}")


if __name__ == "__main__":
    main()
