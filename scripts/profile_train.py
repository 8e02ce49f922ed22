"""Train-path measurement matrix on the real chip (BENCH.md round-3 train
table): full DyT train step (student+teacher fwd, 4-term loss, backward,
AdamW) at ViT-B/224, batch {64,128,256} x remat {off,on}, plus a
student/teacher/backward share breakdown at batch 64.

Timing is scan-rolled (TSTEPS steps inside one jitted program) so numbers
are pure device time — no tunnel RTT, no per-step dispatch.  MFU is
achieved TFLOPS (XLA cost_analysis) over the ambient matmul rate measured
in the same session, so external HBM/clock throttling shows up as a low
ambient rather than silently poisoning the MFU.

Usage: python scripts/profile_train.py [--quick]
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
REPEATS = 3


from scripts.bench_util import ambient_tflops  # noqa: E402  (shared probe)


def time_scan_steps(model, sel, batch, tsteps=TSTEPS):
    """(seconds/step, flops/step) for the full train step at this batch."""
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
        _, ls = jax.lax.scan(body, st, None, length=tsteps)
        return ls.sum()

    _ = float(steps_scan(state, x, y))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(steps_scan(state, x, y))
        best = min(best, time.perf_counter() - t0)
    flops = None
    try:
        ca = steps_scan.lower(state, x, y).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        # XLA cost_analysis counts a while-loop body ONCE (verified on CPU:
        # scan length 2 and 8 report identical flops), so the program total
        # IS the per-step count
        flops = ca["flops"]
    except Exception:
        pass
    return best / tsteps, flops


def forward_times(model, sel, batch):
    """Device time of the student fwd (train mode) and teacher fwd alone.

    Params are passed as a scan-carried ARGUMENT, not a closure — a closed-
    over ViT-B param tree becomes 344 MB of embedded HLO constants and blows
    the remote-compile request limit (observed HTTP 413)."""
    from scripts.bench_util import device_time

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    rngs = {"gate": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}

    def student(xx, p):
        logits, aux = model.apply({"params": p}, xx, training=True,
                                  rngs=rngs)
        return logits.sum() + aux["token_select"].sum()

    def teacher(xx, p):
        logits, _ = model.apply({"params": p}, xx, training=True,
                                complete_model=True, rngs=rngs)
        return logits.sum()

    return device_time(student, x, params), device_time(teacher, x, params)


def main():
    quick = "--quick" in sys.argv
    amb = ambient_tflops()
    print(f"ambient bf16 matmul: "
          f"{'unmeasurable (RTT noise)' if amb is None else f'{amb:.1f}'} "
          f"TFLOPS", flush=True)
    sel = SelectConfig()
    rows = []
    for batch in ([64] if quick else [64, 128, 256]):
        for remat in ([False] if quick else [False, True]):
            cfg = ModelConfig(num_classes=100, remat=remat)
            model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                      dtype=jnp.bfloat16)
            s, flops = time_scan_steps(model, sel, batch)
            row = {"batch": batch, "remat": remat,
                   "ms_per_step": round(s * 1e3, 2),
                   "img_s": round(batch / s, 1)}
            # analytic train FLOPs: student fwd + teacher fwd + their dx
            # backward chains (dW only touches the ~1.2M trainable params)
            # ~= 4x the dense eval forward (ops/flops.py, pinned vs 17.6G)
            from dynamic_tuning_tpu.ops.flops import dense_vit_flops
            # GFLOPs in 1-MAC=1-FLOP convention -> x1e9 x2 for hardware FLOPs
            analytic = 4.0 * 2.0 * dense_vit_flops() * 1e9 * batch
            row["tflops_analytic"] = round(analytic / s / 1e12, 1)
            if amb:
                row["mfu_vs_ambient"] = round(analytic / s / 1e12 / amb, 3)
            if flops:
                row["tflops_xla_count"] = round(flops / s / 1e12, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)

    cfg = ModelConfig(num_classes=100)
    model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                              dtype=jnp.bfloat16)
    ts, tt = forward_times(model, sel, 64)
    full = next(r for r in rows if r["batch"] == 64 and not r["remat"])
    bwd = full["ms_per_step"] / 1e3 - ts - tt
    print(json.dumps({"breakdown_batch64_ms": {
        "student_fwd": round(ts * 1e3, 2), "teacher_fwd": round(tt * 1e3, 2),
        "bwd_plus_opt": round(bwd * 1e3, 2),
        "step": full["ms_per_step"]},
        "ambient_tflops": round(amb, 1) if amb else None}),
        flush=True)


if __name__ == "__main__":
    main()
