"""Serving-attention comparison: fused Pallas kernel vs the XLA
transpose+core path it replaces, with tunnel-RTT-free timing (bench_util).

Consolidates the round-1 profile_attn*.py series; the full narrative of what
was tried and measured lives in BENCH.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.ops.mha_serving import (mha_fused_reference,
                                                mha_serving_fused)

B, N, H, hd = 128, 197, 12, 64
C = H * hd


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)

    ref = lambda x: mha_fused_reference(x, heads=H)
    print(f"xla transpose+core : {device_time(ref, qkv)*1e3:8.4f} ms")
    for g in (2, 4, 6, 12):
        fn = lambda x, g=g: mha_serving_fused(x, heads=H, group=g)
        print(f"pallas fused g={g:2d}  : {device_time(fn, qkv)*1e3:8.4f} ms")

    # calibration anchors
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    t = device_time(mm, a, b)
    print(f"matmul 4096^3      : {t*1e3:8.4f} ms  {2*4096**3/t/1e12:6.1f} TFLOPS")


if __name__ == "__main__":
    main()
