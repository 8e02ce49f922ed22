"""Decompose the capacity-dispatch overhead at bench shapes (RTT-free).

Pieces per block: top_k, one-hot build, gather matmul, MLP on K rows,
scatter matmul — vs the dense MLP they replace.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time

B, N, C, HID, K = 128, 197, 768, 3072, 104
key = jax.random.PRNGKey(0)


def main():
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    scores = jax.random.uniform(key, (B, N), jnp.float32)
    w1 = jax.random.normal(key, (C, HID), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (HID, C), jnp.bfloat16) * 0.02

    def topk(s):
        vals, idx = jax.lax.top_k(s, K)
        return idx.astype(jnp.int32).astype(jnp.float32).sum() + vals.sum()

    vals, idx = jax.lax.top_k(scores, K)
    keep = (vals > 0.5).astype(jnp.bfloat16)

    def onehot(idxf):
        i = idxf.astype(jnp.int32)
        return jax.nn.one_hot(i, N, dtype=jnp.bfloat16) * keep[..., None]

    oh = jax.jit(onehot)(idx.astype(jnp.float32))

    def gather(oh):
        return jax.lax.dot_general(oh, x, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.bfloat16)

    xg = jax.jit(gather)(oh)

    def mlp_k(xg):
        h = jax.nn.gelu(jnp.dot(xg, w1, preferred_element_type=jnp.bfloat16),
                        approximate=True)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    yg = jax.jit(mlp_k)(xg)

    def scatter(yg):
        return jax.lax.dot_general(oh, yg, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.bfloat16)

    def mlp_dense(x):
        h = jax.nn.gelu(jnp.dot(x, w1, preferred_element_type=jnp.bfloat16),
                        approximate=True)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    def full_dispatch(s):
        vals, idx = jax.lax.top_k(s, K)
        keep = (vals > 0.5).astype(jnp.bfloat16)
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16) * keep[..., None]
        xg = jax.lax.dot_general(oh, x, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.bfloat16)
        yg = mlp_k(xg)
        return jax.lax.dot_general(oh, yg, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.bfloat16)

    for name, fn, args in [
        ("top_k [128,197]->104", topk, (scores,)),
        ("one_hot build", onehot, (idx.astype(jnp.float32),)),
        ("gather matmul", gather, (oh,)),
        ("mlp on K rows", mlp_k, (xg,)),
        ("scatter matmul", scatter, (yg,)),
        ("FULL dispatch+mlp", full_dispatch, (scores,)),
        ("dense mlp (ref)", mlp_dense, (x,)),
    ]:
        t = device_time(fn, *args)
        print(f"{name:22s}: {t*1e3:8.4f} ms")


if __name__ == "__main__":
    main()
