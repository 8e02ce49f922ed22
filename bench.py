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
ITERS = 30
REPEATS = 5


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    # inference-speed config for BOTH sides (the reference equally runs its
    # dense baseline and DyT under AMP, speed.py:247): bf16 residual stream,
    # tanh GELU; the flax path (fastest for both modes) is benched.
    # Dense baseline = the PLAIN ViT-B (no adapter, no router) — the
    # reference's dense comparator is models/original_vision_transformerl_
    # IN21K.py (the commented import at speed.py:39), not the DyT model in
    # complete mode.  Both models share the fused serving attention kernel.
    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16")
    sel = SelectConfig(token_target_ratio=0.5)
    dyt_model = VisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                  dtype=jnp.bfloat16)
    dense_model = VisionTransformer(cfg, tuning=TuningConfig(ffn_adapt=False),
                                    select=SelectConfig(open=False),
                                    dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    dyt_params = dyt_model.init(jax.random.PRNGKey(1), x[:2])["params"]
    dense_params = dense_model.init(jax.random.PRNGKey(1), x[:2])["params"]

    def make_fn(mode):
        if mode == "dense":
            def fn(p, xx):
                logits, _ = dense_model.apply({"params": p}, xx)
                return logits.sum()
        else:
            def fn(p, xx):
                logits, _ = dyt_model.apply({"params": p}, xx, dispatch=True)
                return logits.sum()
        return fn

    # Repeats are interleaved dense/dispatch so chip-speed drift (shared /
    # remote chips) cancels out of the ratio.
    def compile_many(mode, params):
        fn = make_fn(mode)

        @jax.jit
        def many(p, xx):
            def body(c, _):
                return fn(p, xx + c * 1e-12).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out

        _ = float(many(params, x))     # compile + warm
        return many

    dense_many = compile_many("dense", dense_params)
    dyt_many = compile_many("dispatch", dyt_params)
    best = {"dense": float("inf"), "dyt": float("inf")}
    for _ in range(REPEATS):
        for name, many, p in (("dense", dense_many, dense_params),
                              ("dyt", dyt_many, dyt_params)):
            t0 = time.perf_counter()
            _ = float(many(p, x))
            best[name] = min(best[name], time.perf_counter() - t0)
    dense_ips = BATCH * ITERS / best["dense"]
    dyt_ips = BATCH * ITERS / best["dyt"]

    # int8 (W8A8) serving mode — same models with quantized serving matmuls
    # (ops/quant.py); reported alongside, never as the headline ratio (the
    # reference protocol is mixed-precision float, our bf16)
    q8 = {}
    try:
        import dataclasses
        dyt_q8 = VisionTransformer(
            dataclasses.replace(cfg, quant="int8"), tuning=TuningConfig(),
            select=sel, dtype=jnp.bfloat16)
        def fn_q8(p, xx):
            logits, _ = dyt_q8.apply({"params": p}, xx, dispatch=True)
            return logits.sum()
        @jax.jit
        def many_q8(p, xx):
            def body(c, _):
                return fn_q8(p, xx + c * 1e-12).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        _ = float(many_q8(dyt_params, x))
        t_best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _ = float(many_q8(dyt_params, x))
            t_best = min(t_best, time.perf_counter() - t0)
        q8_ips = BATCH * ITERS / t_best
        q8 = {"int8_img_s": round(q8_ips, 2),
              "int8_vs_dense_bf16": round(q8_ips / dense_ips, 4)}
    except Exception:
        pass  # int8 serving is an extra: never fail the headline bench

    # chip-health probe: the tunneled chip is sometimes externally
    # throttled (observed 0.2 vs 182 TFLOPS); vs_baseline is same-run
    # interleaved so the RATIO survives, but absolute img/s doesn't —
    # record the ambient matmul rate so low absolutes are interpretable
    health = {}
    try:
        a = jax.random.normal(rng, (2048, 2048), jnp.bfloat16)

        def mm_many(iters):
            @jax.jit
            def f(aa):
                def body(c, _):
                    return ((aa + c * 1e-12) @ aa).astype(
                        jnp.float32).sum(), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=iters)
                return out
            _ = float(f(a))
            t0 = time.perf_counter()
            _ = float(f(a))
            return time.perf_counter() - t0

        # two scan lengths difference away the tunnel RTT
        dt = (mm_many(65) - mm_many(5)) / 60
        health = {"chip_bf16_tflops": round(2 * 2048 ** 3 / dt / 1e12, 1)}
    except Exception:
        pass

    print(json.dumps({
        "metric": "DyT ViT-B/16 images/sec/chip (capacity dispatch, keep 0.5, batch 128, bf16)",
        "value": round(dyt_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(dyt_ips / dense_ips, 4),
        "baseline_dense_ips": round(dense_ips, 2),
        **q8,
        **health,
    }))


if __name__ == "__main__":
    main()
