"""Does the MXU int8 path double matmul throughput on this chip?

Compares a Pallas int8xint8->int32 matmul against the same-shape bf16
matmul at the serving kernel's working shapes (per-sample qkv projection
[N, C] @ [C, 3C] and the batched MLP shapes), using the RTT-cancelling
scan-difference harness from scripts/bench_util.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench_util import device_time


def _mm_kernel(a_ref, b_ref, o_ref, *, out_dtype):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def make_mm(M, K, N, dtype, out_dtype):
    @jax.jit
    def mm(a, b):
        return pl.pallas_call(
            functools.partial(_mm_kernel, out_dtype=out_dtype),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        )(a, b)
    return mm


def bench(M, K, N, dtype, out_dtype, label):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (M, K), dtype)
        b = jax.random.normal(key, (K, N), dtype)
    mm = make_mm(M, K, N, dtype, out_dtype)
    try:
        out = mm(a, b)
        out.block_until_ready()
    except Exception as e:
        print(f"{label}: FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t = device_time(mm, a, b)
    tflops = 2 * M * K * N / t / 1e12
    print(f"{label}: {t*1e6:.1f} us  {tflops:.1f} T{'OPS' if dtype==jnp.int8 else 'FLOPS'}")


if __name__ == "__main__":
    for shape in [(512, 512, 512), (2048, 2048, 2048),
                  (197, 768, 2304), (1576, 768, 2304),  # 8 samples stacked
                  (12672, 768, 3072)]:                  # dispatch MLP B=128 K=99
        M, K, N = shape
        bench(M, K, N, jnp.bfloat16, jnp.float32, f"bf16 {shape}")
        bench(M, K, N, jnp.int8, jnp.int32, f"int8 {shape}")
