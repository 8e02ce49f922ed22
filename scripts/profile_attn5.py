"""One-hot-matmul dispatch vs gather/scatter dispatch vs full MLP (reliable
long-scan timing)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, C, K = 128, 197, 768, 112
ITERS = 100
BF16 = jnp.bfloat16


def timed(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(a[0] + (c * 1e-12).astype(a[0].dtype), *a[1:])
            return out.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = min(_t(many, args) for _ in range(3))
    print(json.dumps({"name": name, "us": round(best / ITERS * 1e6, 1),
                      "x12_ms": round(12 * best / ITERS * 1e3, 2)}), flush=True)


def _t(many, args):
    t0 = time.perf_counter()
    _ = float(many(*args))
    return time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C), BF16)
    scores = jax.random.uniform(key, (B, N), jnp.float32)
    w1 = jax.random.normal(key, (C, 4 * C), BF16) * 0.02
    w2 = jax.random.normal(key, (4 * C, C), BF16) * 0.02

    def onehot_dispatch(x, scores, w1, w2):
        vv, idx = jax.lax.top_k(scores, K)
        oh = jax.nn.one_hot(idx, N, dtype=BF16)           # [B,K,N]
        oh = oh * (vv > 0.5)[..., None].astype(BF16)      # fold threshold mask
        xg = jax.lax.dot_general(oh, x, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=BF16)   # [B,K,C]
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        out = jax.lax.dot_general(oh, y, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=BF16)  # [B,N,C]
        return (x + out).sum()

    timed("onehot_matmul_dispatch", onehot_dispatch, x, scores, w1, w2)

    def onehot_scatter_only(x, scores, w1, w2):
        vv, idx = jax.lax.top_k(scores, K)
        oh = jax.nn.one_hot(idx, N, dtype=BF16)
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)   # cheap gather
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        y = y * (vv > 0.5)[..., None]
        out = jax.lax.dot_general(oh, y, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=BF16)
        return (x + out).sum()

    timed("gather_then_onehot_scatter", onehot_scatter_only, x, scores, w1, w2)

    def gather_set(x, scores, w1, w2):
        vv, idx = jax.lax.top_k(scores, K)
        b = jnp.arange(B)[:, None]
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        y = y * (vv > 0.5)[..., None]
        out = jnp.zeros_like(x).at[b, idx].set(y)
        return (x + out).sum()

    timed("gather_zeros_set", gather_set, x, scores, w1, w2)

    def mlp_full(x, scores, w1, w2):
        h = jnp.dot(x, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        return (x + y).sum()

    timed("mlp_full_197", mlp_full, x, scores, w1, w2)

    def mlp_112_only(x, scores, w1, w2):
        xg = x[:, :K]
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        return (x[:, :K] + y).sum()

    timed("mlp_112_contiguous_floor", mlp_112_only, x, scores, w1, w2)


if __name__ == "__main__":
    main()
