"""Benchmark the Pallas serving MHA kernel vs the XLA lowering on real TPU.

Shape: ViT-B/16 @ 224 -> B=128, H=12, N=197, hd=64 (the bench.py headline
shape).  Also the dispatch-path shape (same: attention is always dense).

Run: python scripts/profile_mha_serving.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.ops.mha_serving import mha_serving, mha_serving_reference

B, H, N, hd = 128, 12, 197, 64


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, N, hd), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, hd), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, hd), jnp.bfloat16)

    ref = jax.jit(mha_serving_reference)
    o_ref = ref(q, k, v)
    try:
        o_pal = mha_serving(q, k, v)
        err = jnp.max(jnp.abs(o_pal.astype(jnp.float32) - o_ref.astype(jnp.float32)))
        print(f"max abs err pallas vs xla: {err:.2e}")
        t_pal = timeit(mha_serving, q, k, v)
        print(f"pallas : {t_pal*1e3:8.3f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"pallas FAILED: {type(e).__name__}: {str(e)[:500]}")
    t_ref = timeit(ref, q, k, v)
    print(f"xla    : {t_ref*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
