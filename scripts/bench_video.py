"""Video throughput: DyT dispatch vs plain dense video ViT (fused kernels).

Protocol mirrors the image bench: batch 16 clips x 8 frames, bf16,
interleaved repeats, best-of.  Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH, T, ITERS, REPEATS = 16, 8, 10, 4


def main():
    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

    quant = "int8" if "--quant" in sys.argv[1:] else "none"
    cfg = ModelConfig(num_classes=400, num_frames=T, gelu_approx=True,
                      residual_dtype="bfloat16", quant=quant)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, T, 224, 224, 3),
                          jnp.float32)

    dyt = VideoVisionTransformer(cfg, tuning=TuningConfig(),
                                 select=SelectConfig(token_target_ratio=0.5),
                                 dtype=jnp.bfloat16)
    dense = VideoVisionTransformer(cfg, tuning=TuningConfig(ffn_adapt=False),
                                   select=SelectConfig(open=False),
                                   dtype=jnp.bfloat16)
    dyt_p = dyt.init(jax.random.PRNGKey(1), x[:1])["params"]
    dense_p = dense.init(jax.random.PRNGKey(1), x[:1])["params"]

    def compile_many(model, params, **kw):
        @jax.jit
        def many(p, xx):
            def body(c, _):
                logits, _aux = model.apply({"params": p}, xx + (c != 0).astype(xx.dtype), **kw)
                return logits.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out
        _ = float(many(params, x))
        return many

    dense_many = compile_many(dense, dense_p)
    dyt_many = compile_many(dyt, dyt_p, dispatch=True)

    best = {"dense": float("inf"), "dyt": float("inf")}
    for _ in range(REPEATS):
        for name, many, p in (("dense", dense_many, dense_p),
                              ("dyt", dyt_many, dyt_p)):
            t0 = time.perf_counter()
            _ = float(many(p, x))
            best[name] = min(best[name], time.perf_counter() - t0)
    dense_cps = BATCH * ITERS / best["dense"]
    dyt_cps = BATCH * ITERS / best["dyt"]
    print(json.dumps({
        "metric": f"video DyT clips/s (keep 0.5, 16x8x224, "
                  f"{'int8' if quant == 'int8' else 'bf16'})",
        "dyt_clips_s": round(dyt_cps, 1),
        "dense_clips_s": round(dense_cps, 1),
        "vs_dense": round(dyt_cps / dense_cps, 4)}))


if __name__ == "__main__":
    main()
