"""Seg backbone eval throughput: bf16 vs int8-MLP quant at the ADE20K
slide-window shape (B=4 crops of 512^2 -> N=1025 tokens).

The windowed (rel-pos-bias) attention stays on the bf16 fused kernel
(ops/mha_serving.py::mha_windowed_fused); --quant int8 swaps only the
LN+MLP onto the int8 kernel (ops/quant.py) on this path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, ITERS, REPEATS = 4, 8, 4


def bench(quant):
    from dynamic_tuning_tpu.config import (ModelConfig, SelectConfig,
                                           TuningConfig)
    from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer

    cfg = ModelConfig(img_size=512, num_classes=0, gelu_approx=True,
                      residual_dtype="bfloat16", quant=quant)
    model = SegVisionTransformer(cfg, tuning=TuningConfig(),
                                 select=SelectConfig(token_target_ratio=0.5),
                                 dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 3),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:1])["params"]

    @jax.jit
    def many(p, xx):
        def body(c, _):
            feats, _sel = model.apply({"params": p}, xx + (c != 0).astype(xx.dtype),
                                      dispatch=True)
            return sum(f.astype(jnp.float32).sum() for f in feats), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(params, x))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(params, x))
        best = min(best, time.perf_counter() - t0)
    return B * ITERS / best


if __name__ == "__main__":
    bf16 = bench("none")
    q8 = bench("int8")
    print(f"seg backbone 512^2 crops/s: bf16 {bf16:.1f}  int8 {q8:.1f} "
          f"({q8 / bf16:.2f}x)")
