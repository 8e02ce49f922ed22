"""Benchmark the whole-sublayer fused kernel vs its XLA composition and vs
the current (qkv-in-XLA + fused-core) split, RTT-free."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.ops.mha_serving import (attention_sublayer_reference,
                                                attention_sublayer_serving,
                                                mha_serving_fused)

B, N, H, hd = 128, 197, 12, 64
C = H * hd
key = jax.random.PRNGKey(0)


def main():
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32) + 0.02
    beta = jnp.zeros((C,), jnp.float32) + 0.01
    wqkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.03
    bqkv = jax.random.normal(key, (3 * C,), jnp.float32) * 0.02
    wproj = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.03
    bproj = jax.random.normal(key, (C,), jnp.float32) * 0.02

    fused = lambda x: attention_sublayer_serving(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, heads=H)
    ref = jax.jit(lambda x: attention_sublayer_reference(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, heads=H))

    o1, o2 = fused(x), ref(x)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"max abs err vs xla composition: {err:.2e}")
    print(f"fused sublayer kernel : {device_time(fused, x)*1e3:7.4f} ms")
    print(f"xla composition       : {device_time(ref, x)*1e3:7.4f} ms")

    # current split: XLA LN+qkv, pallas core, XLA proj+residual
    def split(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta).astype(jnp.bfloat16)
        qkv = (jnp.dot(ln, wqkv, preferred_element_type=jnp.float32)
               + bqkv).astype(jnp.bfloat16)
        o = mha_serving_fused(qkv, heads=H)
        proj = jnp.dot(o, wproj, preferred_element_type=jnp.float32) + bproj
        return (xf + proj).astype(x.dtype)

    print(f"split (current path)  : {device_time(jax.jit(split), x)*1e3:7.4f} ms")


if __name__ == "__main__":
    main()
