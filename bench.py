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


def preflight(timeout_s=240.0):
    """True iff the device answers a tiny matmul within ``timeout_s``.

    The tunneled TPU can go fully unreachable (observed at the round-3
    boundary: a 256^2 matmul never returned); without this guard the
    first jit compile below blocks forever and the driver records no
    bench line at all.  The probe runs in a daemon thread so a wedged
    backend can't hang the watchdog itself.
    """
    import threading

    ok = threading.Event()

    def probe():
        try:
            a = jnp.ones((256, 256), jnp.float32)
            (a @ a).block_until_ready()
            ok.set()
        except Exception:
            pass

    threading.Thread(target=probe, daemon=True).start()
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout_s:
        if ok.wait(timeout=5.0):
            return True
    return ok.is_set()


def main():
    if not preflight():
        import os
        import sys
        print(json.dumps({
            "metric": "DyT ViT-B/16 images/sec/chip (capacity dispatch, keep 0.5, batch 128, bf16)",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "device unreachable: 256^2 matmul did not complete "
                     "within the preflight timeout (tunnel outage)",
        }))
        sys.stdout.flush()
        os._exit(0)   # a wedged backend thread must not hang the exit
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
                return fn(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
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
                return fn_q8(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
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

    # MoE-enhanced adapter serving (the north-star clause: MoE fuses into
    # the same Pallas prologue — ops/mha_serving.py::dyt_prologue_serving_moe)
    moe = {}
    try:
        dyt_moe = VisionTransformer(cfg, tuning=TuningConfig(moe_experts=4),
                                    select=sel, dtype=jnp.bfloat16)
        moe_params = dyt_moe.init(jax.random.PRNGKey(1), x[:2])["params"]
        def fn_moe(p, xx):
            logits, _ = dyt_moe.apply({"params": p}, xx, dispatch=True)
            return logits.sum()
        @jax.jit
        def many_moe(p, xx):
            def body(c, _):
                return fn_moe(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        _ = float(many_moe(moe_params, x))
        t_best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _ = float(many_moe(moe_params, x))
            t_best = min(t_best, time.perf_counter() - t0)
        moe_ips = BATCH * ITERS / t_best
        moe = {"moe4_img_s": round(moe_ips, 2),
               "moe4_premium_vs_plain_dyt": round(dyt_ips / moe_ips, 4)}
        # int8 MoE (ops/quant.py::dyt_prologue_serving_q8_moe) — same
        # params, quantized at serving time like the plain int8 field
        import dataclasses as _dcm
        moe_q8 = VisionTransformer(
            _dcm.replace(cfg, quant="int8"),
            tuning=TuningConfig(moe_experts=4), select=sel,
            dtype=jnp.bfloat16)
        def fn_moe_q8(p, xx):
            logits, _ = moe_q8.apply({"params": p}, xx, dispatch=True)
            return logits.sum()
        @jax.jit
        def many_moe_q8(p, xx):
            def body(c, _):
                return fn_moe_q8(p, xx + (c != 0).astype(xx.dtype)).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        _ = float(many_moe_q8(moe_params, x))
        t_best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _ = float(many_moe_q8(moe_params, x))
            t_best = min(t_best, time.perf_counter() - t0)
        moe_q8_ips = BATCH * ITERS / t_best
        moe["moe4_int8_img_s"] = round(moe_q8_ips, 2)
        if q8.get("int8_img_s"):
            moe["moe4_int8_premium_vs_plain_int8"] = round(
                q8["int8_img_s"] / moe_q8_ips, 4)
    except Exception:
        pass  # MoE serving is an extra: never fail the headline bench

    # chip-health probe: the tunneled chip is sometimes externally
    # throttled (observed 0.2 vs 182 TFLOPS); vs_baseline is same-run
    # interleaved so the RATIO survives, but absolute img/s doesn't —
    # record the ambient matmul rate so low absolutes are interpretable.
    # The scan lengths are >=1000 apart so the differenced device time
    # (~94 ms healthy) dwarfs the tunnel's ~25 ms drifting RTT; best-of-3
    # each side, and implausible (non-positive) differences are reported as
    # null rather than a nonsense negative TFLOPS (round-2 BENCH_r02.json
    # recorded -134.2 from a 60-iter spread below RTT noise).
    health = {}
    try:
        a = jax.random.normal(rng, (2048, 2048), jnp.bfloat16)

        def mm_many(iters):
            @jax.jit
            def f(aa):
                def body(c, _):
                    return ((aa + (c != 0).astype(aa.dtype)) @ aa).astype(
                        jnp.float32).sum(), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=iters)
                return out

            _ = float(f(a))          # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(f(a))
                best = min(best, time.perf_counter() - t0)
            return best

        t_small = mm_many(5)         # ~RTT + 5 matmuls
        t_big = mm_many(1005)        # ~RTT + 1005 matmuls
        dt = (t_big - t_small) / 1000
        tflops = 2 * 2048 ** 3 / dt / 1e12 if dt > 0 else None
        health = {
            "chip_bf16_tflops": round(tflops, 1) if tflops else None,
            "probe_rtt_ms_est": round(t_small * 1e3, 1),
        }
    except Exception:
        pass

    # train-path throughput (VERDICT r2: the train side was asserted, not
    # measured).  The full train step (student+teacher fwd, 4-term loss,
    # backward, AdamW) is rolled into one lax.scan program so the number is
    # pure device time; MFU is achieved-TFLOPS over the ambient matmul rate
    # the health probe just measured (self-calibrating against throttling).
    trn = {}
    try:
        from dynamic_tuning_tpu.train.engine import (create_train_state,
                                                     make_train_step,
                                                     model_apply_fn)
        from dynamic_tuning_tpu.train.optim import (make_optimizer,
                                                    partition_params)

        TB, TSTEPS = 64, 8
        tmodel = VisionTransformer(ModelConfig(num_classes=100),
                                   tuning=TuningConfig(), select=sel,
                                   dtype=jnp.bfloat16)
        xt = jax.random.normal(rng, (TB, 224, 224, 3), jnp.float32)
        yt = jnp.zeros((TB,), jnp.int32)
        tparams = tmodel.init(jax.random.PRNGKey(1), xt[:2])["params"]
        tr, fr = partition_params(tparams)
        tx = make_optimizer(1e-3, steps_per_epoch=100)
        tstate = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
        base_step = make_train_step(model_apply_fn(tmodel), tx, sel)

        @jax.jit
        def steps_scan(st, xx, yy):
            def body(s, _):
                s2, parts = base_step(s, xx, yy)
                return s2, parts["loss"]
            _, ls = jax.lax.scan(body, st, None, length=TSTEPS)
            return ls.sum()

        _ = float(steps_scan(tstate, xt, yt))    # compile + warm
        t_best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(steps_scan(tstate, xt, yt))
            t_best = min(t_best, time.perf_counter() - t0)
        step_s = t_best / TSTEPS
        trn = {"train_img_s": round(TB * TSTEPS / t_best, 1),
               "train_ms_per_step": round(step_s * 1e3, 2)}
        try:
            # analytic train FLOPs (student+teacher fwd + their dx backward
            # chains; dW only for the ~1.2M trainable params) ~= 4x the
            # dense eval forward.  XLA cost_analysis is NOT used: it counts
            # a scan body once and its flop model overcounts vs the pinned
            # analytic constants (ops/flops.py vs reference 17.6G).
            from dynamic_tuning_tpu.ops.flops import dense_vit_flops
            # dense_vit_flops is GFLOPs in the fvcore 1-MAC=1-FLOP
            # convention; x2 converts MACs to hardware mul+add FLOPs
            step_tflops = (4.0 * 2.0 * dense_vit_flops() * 1e9 * TB
                           / step_s / 1e12)
            trn["train_tflops_analytic"] = round(step_tflops, 1)
            if health.get("chip_bf16_tflops"):
                trn["train_mfu_vs_ambient"] = round(
                    step_tflops / health["chip_bf16_tflops"], 3)
        except Exception:
            pass
    except Exception:
        pass  # train bench is an extra: never fail the headline

    # --- video family (VERDICT r3 #7: three-family headline) -------------
    # protocol = scripts/bench_video.py: 16 clips x 8 frames, bf16 serving
    vid = {}
    try:
        from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

        VB, VT, VITERS = 16, 8, 10
        vcfg = ModelConfig(num_classes=400, num_frames=VT, gelu_approx=True,
                           residual_dtype="bfloat16")
        vx = jax.random.normal(rng, (VB, VT, 224, 224, 3), jnp.float32)
        vdyt = VideoVisionTransformer(vcfg, tuning=TuningConfig(),
                                      select=sel, dtype=jnp.bfloat16)
        vdense = VideoVisionTransformer(vcfg,
                                        tuning=TuningConfig(ffn_adapt=False),
                                        select=SelectConfig(open=False),
                                        dtype=jnp.bfloat16)
        vdyt_p = vdyt.init(jax.random.PRNGKey(1), vx[:1])["params"]
        vdense_p = vdense.init(jax.random.PRNGKey(1), vx[:1])["params"]
        import dataclasses as _dc
        vq8 = VideoVisionTransformer(_dc.replace(vcfg, quant="int8"),
                                     tuning=TuningConfig(), select=sel,
                                     dtype=jnp.bfloat16)

        def v_many(model, **kw):
            @jax.jit
            def many(p, xx):
                def body(c, _):
                    logits, _a = model.apply(
                        {"params": p}, xx + (c != 0).astype(xx.dtype), **kw)
                    return logits.sum().astype(jnp.float32), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=VITERS)
                return out
            return many

        vd_many = v_many(vdense)
        vy_many = v_many(vdyt, dispatch=True)
        vq_many = v_many(vq8, dispatch=True)
        _ = float(vd_many(vdense_p, vx)); _ = float(vy_many(vdyt_p, vx))
        _ = float(vq_many(vdyt_p, vx))
        vbest = {"dense": float("inf"), "dyt": float("inf"),
                 "q8": float("inf")}
        for _ in range(3):   # interleaved: the ratio survives drift
            for name, many, p in (("dense", vd_many, vdense_p),
                                  ("dyt", vy_many, vdyt_p),
                                  ("q8", vq_many, vdyt_p)):
                t0 = time.perf_counter()
                _ = float(many(p, vx))
                vbest[name] = min(vbest[name], time.perf_counter() - t0)
        vid = {"video_clips_s": round(VB * VITERS / vbest["dyt"], 1),
               "video_dense_clips_s": round(VB * VITERS / vbest["dense"], 1),
               "video_vs_dense": round(vbest["dense"] / vbest["dyt"], 4),
               "video_int8_clips_s": round(VB * VITERS / vbest["q8"], 1),
               "video_int8_vs_dense": round(vbest["dense"] / vbest["q8"], 4)}
    except Exception:
        pass  # video bench is an extra: never fail the headline

    # --- seg family: full DyTSegmentor (UPerHead included — the deployed
    # model; the head is routing-independent so it dilutes the ratio,
    # BENCH.md head-dominance note), 512^2 crops.  Batch-1 tile forwards ==
    # the SHIPPING slide default (tile_batch=1, the reference cadence AND
    # the faster compute — batching 512^2 tiles costs ~17%/tile; measured
    # end-to-end in scripts/bench_seg_compound.py, BENCH.md round 5) --------
    seg = {}
    try:
        from dynamic_tuning_tpu.models.upernet import DyTSegmentor

        SB, SITERS = 1, 12
        scfg = ModelConfig(img_size=512, gelu_approx=True,
                           residual_dtype="bfloat16")
        sx = jax.random.normal(rng, (SB, 512, 512, 3), jnp.float32)
        sdyt = DyTSegmentor(scfg, num_classes=150, tuning=TuningConfig(),
                            select=sel, dtype=jnp.bfloat16)
        sdense = DyTSegmentor(scfg, num_classes=150,
                              tuning=TuningConfig(ffn_adapt=False),
                              select=SelectConfig(open=False),
                              dtype=jnp.bfloat16)
        sdyt_p = sdyt.init(jax.random.PRNGKey(1), sx[:1])["params"]
        sdense_p = sdense.init(jax.random.PRNGKey(1), sx[:1])["params"]
        import dataclasses as _dc2
        sq8 = DyTSegmentor(_dc2.replace(scfg, quant="int8"), num_classes=150,
                           tuning=TuningConfig(), select=sel,
                           dtype=jnp.bfloat16)

        def s_many(model, **kw):
            @jax.jit
            def many(p, xx):
                def body(c, _):
                    logits, _aux, _sel = model.apply(
                        {"params": p}, xx + (c != 0).astype(xx.dtype),
                        training=False, **kw)
                    return logits.sum().astype(jnp.float32), None
                out, _ = jax.lax.scan(body, jnp.float32(0), None,
                                      length=SITERS)
                return out
            return many

        sd_many = s_many(sdense)
        sy_many = s_many(sdyt, dispatch=True)
        sq_many = s_many(sq8, dispatch=True)
        _ = float(sd_many(sdense_p, sx)); _ = float(sy_many(sdyt_p, sx))
        _ = float(sq_many(sdyt_p, sx))
        sbest = {"dense": float("inf"), "dyt": float("inf"),
                 "q8": float("inf")}
        for _ in range(3):
            for name, many, p in (("dense", sd_many, sdense_p),
                                  ("dyt", sy_many, sdyt_p),
                                  ("q8", sq_many, sdyt_p)):
                t0 = time.perf_counter()
                _ = float(many(p, sx))
                sbest[name] = min(sbest[name], time.perf_counter() - t0)
        seg = {"seg_crops_s": round(SB * SITERS / sbest["dyt"], 2),
               "seg_dense_crops_s": round(SB * SITERS / sbest["dense"], 2),
               "seg_vs_dense": round(sbest["dense"] / sbest["dyt"], 4),
               "seg_int8_crops_s": round(SB * SITERS / sbest["q8"], 2),
               "seg_int8_vs_dense": round(sbest["dense"] / sbest["q8"], 4),
               "seg_protocol": "shipping default: dispatch, head 768, "
                               "bf16, batch-1 tiles == slide tile_batch=1"}
    except Exception:
        pass  # seg bench is an extra: never fail the headline

    print(json.dumps({
        "metric": "DyT ViT-B/16 images/sec/chip (capacity dispatch, keep 0.5, batch 128, bf16)",
        "value": round(dyt_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(dyt_ips / dense_ips, 4),
        "baseline_dense_ips": round(dense_ips, 2),
        **q8,
        **moe,
        **health,
        **trn,
        **vid,
        **seg,
    }))


if __name__ == "__main__":
    main()
