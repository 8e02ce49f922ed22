"""Decompose the serving attention core cost under XLA on real TPU.

Methodology matches bench.py: ITERS chained inside one jitted lax.scan with a
data dependency between iterations, so per-call dispatch overhead and any
host-side pipelining cannot distort the per-iteration time.

Pieces at B=128, H=12, N=197, hd=64 (bench headline shape).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, N, hd = 128, 12, 197, 64
ITERS = 30
REPEATS = 5


def timeit_scan(fn, *args):
    """fn(*args) -> scalar-reducible array; returns ms/iter."""

    @jax.jit
    def many(*a):
        def body(c, _):
            perturbed = (a[0] + c * 1e-12,) + a[1:]
            return fn(*perturbed).astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, N, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, hd), jnp.bfloat16)

    dn_qk = (((3,), (3,)), ((0, 1), (0, 1)))
    dn_av = (((3,), (2,)), ((0, 1), (0, 1)))

    def scores(q, k):
        return jax.lax.dot_general(q, k, dn_qk, preferred_element_type=jnp.float32)

    def scores_exp(q, k):
        s = jax.lax.dot_general(q, k, dn_qk, preferred_element_type=jnp.float32)
        return jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(jnp.bfloat16)

    p = jax.jit(scores_exp)(q, k)

    def av(p, v):
        return jax.lax.dot_general(p, v, dn_av, preferred_element_type=jnp.float32)

    def full(q, k, v):
        s = jax.lax.dot_general(q * (hd ** -0.5), k, dn_qk,
                                preferred_element_type=jnp.float32)
        pp = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(jnp.bfloat16)
        o = jax.lax.dot_general(pp, v, dn_av, preferred_element_type=jnp.float32)
        l = jnp.sum(pp.astype(jnp.float32), axis=-1, keepdims=True)
        return (o / l).astype(jnp.bfloat16)

    def full_bf16(q, k, v):
        s = jax.lax.dot_general(q * (hd ** -0.5), k, dn_qk,
                                preferred_element_type=jnp.bfloat16)
        pp = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
        o = jax.lax.dot_general(pp, v, dn_av, preferred_element_type=jnp.float32)
        l = jnp.sum(pp.astype(jnp.float32), axis=-1, keepdims=True)
        return (o / l).astype(jnp.bfloat16)

    from dynamic_tuning_tpu.ops.mha_serving import mha_serving

    def pallas_core(q, k, v):
        return mha_serving(q, k, v)

    for name, fn, args in [
        ("scores (fp32 out)", scores, (q, k)),
        ("scores+exp (bf16 p)", scores_exp, (q, k)),
        ("av only", av, (p, v)),
        ("full serving core", full, (q, k, v)),
        ("full bf16 scores", full_bf16, (q, k, v)),
        ("pallas mha_serving", pallas_core, (q, k, v)),
    ]:
        print(f"{name:22s}: {timeit_scan(fn, *args):8.3f} ms")


if __name__ == "__main__":
    main()
