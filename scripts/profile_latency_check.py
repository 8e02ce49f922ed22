"""Is the ~1ms/step cost per-op latency, dependency latency, or compute?

  dep_chain  : 30 dependent tiny matmuls (serial by construction)
  indep_sum  : 30 independent tiny matmuls, summed at the end (parallelizable)
  scalar_chain: 30 dependent scalar adds (no real compute at all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 30


def bench(name, f, *args):
    _ = float(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:14s}: {best*1e3:9.3f} ms total  {best/ITERS*1e3:8.4f} ms/step")


def main():
    a = jax.random.normal(jax.random.PRNGKey(0), (394, 128), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (128, 256), jnp.bfloat16)

    @jax.jit
    def dep_chain(a, b):
        c = jnp.float32(0)
        for _ in range(ITERS):
            c = jnp.dot(a + (c * 1e-30).astype(a.dtype), b,
                        preferred_element_type=jnp.float32).sum()
        return c

    @jax.jit
    def indep_sum(a, b):
        outs = []
        for i in range(ITERS):
            outs.append(jnp.dot(a + jnp.bfloat16(i * 1e-8), b,
                                preferred_element_type=jnp.float32).sum())
        return sum(outs)

    @jax.jit
    def scalar_chain(a, b):
        c = a[0, 0].astype(jnp.float32)
        for i in range(ITERS):
            c = jnp.sin(c) + jnp.float32(i)
        return c

    bench("dep_chain", dep_chain, a, b)
    bench("indep_sum", indep_sum, a, b)
    bench("scalar_chain", scalar_chain, a, b)


if __name__ == "__main__":
    main()
