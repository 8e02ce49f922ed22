"""Compile-only HBM accounting for the train step's remat modes: lower +
compile each variant on the TPU (no execution) and print the compiler's
memory analysis.  Diagnoses which mode fits before paying for timing runs
(the chipless AOT compile helper hard-fails at >15.75G instead of
auto-rematerializing).

Usage: python scripts/profile_train_memory.py [batch ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params


def analyze(remat, batch):
    sel = SelectConfig(token_target_ratio=0.5)
    cfg = ModelConfig(num_classes=100, remat=remat)
    model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3))
    y = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    tr, fr = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=100)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))
    try:
        compiled = step.lower(state, x, y).compile()
        m = compiled.memory_analysis()
        print({"batch": batch, "remat": remat,
               "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
               "arg_gb": round(m.argument_size_in_bytes / 2**30, 2),
               "total_gb": round((m.temp_size_in_bytes +
                                  m.argument_size_in_bytes +
                                  m.output_size_in_bytes) / 2**30, 2)},
              flush=True)
    except Exception as e:
        print({"batch": batch, "remat": remat,
               "error": str(e).split("\n")[0][:160]}, flush=True)


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [64]
    for b in batches:
        for mode in (False, "scores", True):
            analyze(mode, b)
