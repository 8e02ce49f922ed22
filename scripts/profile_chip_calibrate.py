"""Calibrate the real chip: achievable matmul TFLOPS and HBM GB/s.

Grounds every kernel decision: if a 'slow' kernel is actually at 80% of
achievable peak, stop optimizing it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 10
REPEATS = 3


def timeit_scan(fn, *args, iters=ITERS):
    @jax.jit
    def many(*a):
        def body(c, _):
            perturbed = (a[0] + (c != 0).astype(a[0].dtype),) + a[1:]
            return fn(*perturbed).astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    _ = float(many(*args))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    # --- peak matmul ---
    for M, K, N in [(4096, 4096, 4096), (8192, 8192, 8192),
                    (2364, 768, 256), (394, 128, 256), (1576, 512, 256)]:
        a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
        fn = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        t = timeit_scan(fn, a, b)
        tf = 2 * M * K * N / t / 1e12
        print(f"matmul {M:5d}x{K:5d}x{N:5d}: {t*1e3:8.3f} ms  {tf:6.1f} TFLOPS")

    # --- batched small matmul (the attention shape) ---
    B, H, n, hd = 128, 12, 197, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, n, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, n, hd), jnp.bfloat16)
    fn = lambda q, k: jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    t = timeit_scan(fn, q, k)
    tf = 2 * B * H * n * n * hd / t / 1e12
    print(f"batched scores 1536x[197,64]x[64,197]: {t*1e3:8.3f} ms  {tf:6.1f} TFLOPS")

    # --- HBM bandwidth: big copy (read + write) ---
    x = jax.random.normal(jax.random.PRNGKey(0), (256 * 1024 * 1024 // 4,), jnp.float32)
    fn = lambda x: x * 1.0000001
    t = timeit_scan(fn, x)
    gbs = 2 * x.size * 4 / t / 1e9
    print(f"copy 1GB (rd+wr): {t*1e3:8.3f} ms  {gbs:6.1f} GB/s")


if __name__ == "__main__":
    main()
