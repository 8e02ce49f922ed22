"""Headline benchmark: DyT efficient-inference throughput vs dense ViT-B/16.

Protocol mirrors the reference speed harness (speed.py:247-275): batch 128,
mixed precision, warmup iters then timed iters with full device fencing
(``block_until_ready`` instead of ``cuda.synchronize``).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
where vs_baseline = DyT-dispatch img/s divided by dense ViT-B img/s on the
same chip (north star: >= 1.3x, BASELINE.json).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


BATCH = 128
WARMUP = 5
ITERS = 15


def _throughput(fn, args, batch: int) -> float:
    """img/s with hard per-iteration device fencing.

    The benched fn must return a SCALAR; we fetch it to host each iteration
    (the TPU analogue of the reference's cuda.synchronize fencing,
    speed.py:258-264 — and robust against async-dispatch pipelining through
    remote-attached devices, where block_until_ready on a single trailing
    buffer has been observed to under-report).
    """
    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = float(fn(*args))
    dt = time.perf_counter() - t0
    return batch * ITERS / dt


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    cfg = ModelConfig(num_classes=100)
    tuning = TuningConfig()
    sel = SelectConfig(token_target_ratio=0.5)
    model = VisionTransformer(cfg, tuning=tuning, select=sel, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]

    @jax.jit
    def dense_fn(p, xx):
        logits, _ = model.apply({"params": p}, xx, complete_model=True)
        return logits.sum()

    @jax.jit
    def dyt_fn(p, xx):
        logits, _ = model.apply({"params": p}, xx, dispatch=True)
        return logits.sum()

    dense_ips = _throughput(dense_fn, (params, x), BATCH)
    dyt_ips = _throughput(dyt_fn, (params, x), BATCH)

    print(json.dumps({
        "metric": "DyT ViT-B/16 images/sec/chip (capacity dispatch, keep 0.5, batch 128, bf16)",
        "value": round(dyt_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(dyt_ips / dense_ips, 4),
        "baseline_dense_ips": round(dense_ips, 2),
    }))


if __name__ == "__main__":
    main()
