"""Deferred-normalize attention variants (normalize after AV matmul)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, N, C = 128, 12, 197, 768
D = C // H
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
    wqkv = jax.random.normal(key, (C, 3 * C), BF16) * 0.02
    wproj = jax.random.normal(key, (C, C), BF16) * 0.02

    def deferred_norm(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jax.lax.dot_general(q * (D ** -0.5), k,
                                (((3,), (3,)), ((0, 1), (0, 1))),
                                preferred_element_type=BF16)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jax.lax.dot_general(p, v, (((3,), (2,)), ((0, 1), (0, 1))),
                                preferred_element_type=jnp.float32)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = (o / l).astype(BF16)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("deferred_normalize_bf16", deferred_norm, x, wqkv, wproj)

    def deferred_norm_f32(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jax.lax.dot_general(q * (D ** -0.5), k,
                                (((3,), (3,)), ((0, 1), (0, 1))),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(BF16)
        o = jax.lax.dot_general(p, v, (((3,), (2,)), ((0, 1), (0, 1))),
                                preferred_element_type=jnp.float32)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = (o / l).astype(BF16)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("deferred_norm_f32scores", deferred_norm_f32, x, wqkv, wproj)


if __name__ == "__main__":
    main()
