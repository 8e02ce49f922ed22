"""Does this chip run fp8 matmuls at the int8 rate?

If float8_e4m3fn (or e5m2) dot_generals hit the MXU's 8-bit path, an fp8
serving mode could match int8's ~2x-over-bf16 rate while replacing the
per-row dynamic quantization (amax + scale + round) with a plain cast —
cheaper epilogues and wider dynamic range.  If XLA upcasts fp8 to bf16
(older TPU generations), the measured rate will sit at the bf16 line and
the experiment is concluded not-applicable for this chip.

Shapes: the serving kernels' working set — per-sample qkv [197,768]x[768,
2304], batched MLP [12672,768]x[768,3072] (batch 64 rows flattened), and a
square 2048^3 calibration point.

Run (TPU): python scripts/profile_fp8.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time


def bench(M, K, N, in_dtype, acc_dtype, label, i2=None):
    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (M, K), jnp.float32).astype(in_dtype)
        b = jax.random.normal(key, (K, N), jnp.float32).astype(in_dtype)

    def mm(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_dtype)

    try:
        jax.jit(mm)(a, b).block_until_ready()
        # sub-us shapes need a wide iteration spread: at the qkv shape one
        # matmul is ~4 us, so the default 50-iter spread (~0.2 ms) is below
        # the tunnel's RTT jitter and differenced times went negative.
        t = device_time(mm, a, b, **({"i2": i2} if i2 else {}))
    except Exception as e:
        print(f"{label:28s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    ops = 2 * M * K * N
    rate = ops / t / 1e12
    print(f"{label:28s} {t * 1e6:9.1f} us  {rate:7.1f} T{'OPS' if in_dtype == jnp.int8 else 'FLOPS'}")
    return rate


def main():
    shapes = [
        ("qkv  197x768x2304", 197, 768, 2304, 5005),
        ("mlp  12672x768x3072", 12672, 768, 3072, 255),
        ("cal  2048^3", 2048, 2048, 2048, 505),
    ]
    for name, M, K, N, i2 in shapes:
        print(f"== {name}")
        base = bench(M, K, N, jnp.bfloat16, jnp.float32, "bf16 -> fp32", i2)
        i8 = bench(M, K, N, jnp.int8, jnp.int32, "int8 -> int32", i2)
        f8 = bench(M, K, N, jnp.float8_e4m3fn, jnp.float32,
                   "fp8_e4m3 -> fp32", i2)
        f8b = bench(M, K, N, jnp.float8_e5m2, jnp.float32,
                    "fp8_e5m2 -> fp32", i2)
        if base:
            for lbl, r in [("int8", i8), ("e4m3", f8), ("e5m2", f8b)]:
                if r:
                    print(f"   {lbl} vs bf16: {r / base:.2f}x")


if __name__ == "__main__":
    main()
