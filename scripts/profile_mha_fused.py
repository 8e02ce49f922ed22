"""Benchmark the fused layout-free serving MHA kernel vs the XLA path.

Measures the FULL attention-core segment including layout costs:
[B, N, 3C] raw qkv -> [B, N, C], i.e. exactly what sits between the qkv
Dense and the output-projection Dense.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.ops.mha_serving import (mha_fused_reference,
                                                mha_serving_fused)

B, N, H, hd = 128, 197, 12, 64
C = H * hd
ITERS = 30
REPEATS = 5


def timeit_scan(fn, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            perturbed = (a[0] + c * 1e-12,) + a[1:]
            return fn(*perturbed).astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)

    ref = lambda x: mha_fused_reference(x, heads=H)
    o_ref = jax.jit(ref)(qkv)

    for g in (2, 4, 6, 12):
        try:
            fn = lambda x, g=g: mha_serving_fused(x, heads=H, group=g)
            o = fn(qkv)
            err = jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref.astype(jnp.float32)))
            t = timeit_scan(fn, qkv)
            print(f"pallas fused g={g:2d}: {t:8.3f} ms   max_err={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"pallas fused g={g:2d}: FAILED {type(e).__name__}: {str(e)[:300]}")
    print(f"xla (transpose+core): {timeit_scan(ref, qkv):8.3f} ms")


if __name__ == "__main__":
    main()
