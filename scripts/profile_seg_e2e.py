"""Full segmentor eval throughput: DyTSegmentor forward (backbone + UPerHead
+ aux FCN) on 512^2 crops — the unit of ADE20K slide inference."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.upernet import DyTSegmentor

B, ITERS, REPEATS = 4, 8, 4


def bench(quant, head_channels=None):
    cfg = ModelConfig(img_size=512, num_classes=0, gelu_approx=True,
                      residual_dtype="bfloat16", quant=quant)
    m = DyTSegmentor(cfg, num_classes=150, tuning=TuningConfig(),
                     select=SelectConfig(token_target_ratio=0.5),
                     head_channels=head_channels, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 3),
                          jnp.float32)
    p = m.init(jax.random.PRNGKey(1), x[:1])["params"]

    @jax.jit
    def many(pp, xx):
        def body(c, _):
            out = m.apply({"params": pp}, xx + (c != 0).astype(xx.dtype), dispatch=True)
            seg = out[0] if isinstance(out, tuple) else out
            return seg.astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(p, x))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(p, x))
        best = min(best, time.perf_counter() - t0)
    return B * ITERS / best


if __name__ == "__main__":
    bf16 = bench("none")
    q8 = bench("int8")
    print(f"segmentor 512^2 crops/s: bf16 {bf16:.1f}  int8 {q8:.1f} "
          f"({q8 / bf16:.2f}x)", flush=True)
    if "--head256" in sys.argv:
        # opt-in narrow head (--seg_head_channels 256): deviation from the
        # reference our_vit.py channels=768 config
        h256 = bench("none", head_channels=256)
        h256q = bench("int8", head_channels=256)
        print(f"segmentor head256 crops/s: bf16 {h256:.1f} "
              f"({h256 / bf16:.2f}x vs ref head)  int8 {h256q:.1f}",
              flush=True)
