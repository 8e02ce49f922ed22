"""Verify timing methodology on the axon-tunneled chip.

Compares three ways of timing the same tiny matmul:
  scan    : lax.scan with data-dependent carry (previous scripts)
  unroll  : statically unrolled dependency chain inside one jit
  dispatch: N separate jit calls, block at end

If scan-per-iter >> unroll-per-iter, the while loop has per-iteration
overhead on this platform and all scan-based numbers are inflated.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

M, K, N = 394, 128, 256
BIGM = 4096


def run(name, M, K, N):
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    def fn(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    ITERS = 30

    @jax.jit
    def scan_many(a, b):
        def body(c, _):
            return fn(a + c.astype(a.dtype), b).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    @jax.jit
    def unroll_many(a, b):
        c = jnp.float32(0)
        for _ in range(ITERS):
            c = fn(a + (c * 1e-30).astype(a.dtype), b).sum()
        return c

    for nm, f in (("scan", scan_many), ("unroll", unroll_many)):
        _ = float(f(a, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(a, b))
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        tf = 2 * M * K * N / per / 1e12
        print(f"{name} {nm:8s}: {per*1e3:8.4f} ms/iter  {tf:6.1f} TFLOPS")

    # plain dispatch
    jfn = jax.jit(fn)
    _ = jfn(a, b).block_until_ready()
    t0 = time.perf_counter()
    outs = [jfn(a, b) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / ITERS
    print(f"{name} dispatch: {per*1e3:8.4f} ms/iter  {2*M*K*N/per/1e12:6.1f} TFLOPS")


def main():
    run("small", M, K, N)
    run("big  ", BIGM, BIGM, BIGM)


if __name__ == "__main__":
    main()
