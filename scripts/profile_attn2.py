"""Full attention-sublayer variants (incl. qkv+proj matmuls) on TPU."""

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

    def current(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q * (D ** -0.5), k,
                       preferred_element_type=BF16)
        a = jax.nn.softmax(a, -1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("current_einsum_bf16", current, x, wqkv, wproj)

    def dpa(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # [B,N,H,D]
        o = jax.nn.dot_product_attention(q, k, v)
        return jnp.dot(o.reshape(B, N, C), wproj,
                       preferred_element_type=BF16).sum()

    timed("jax_nn_dpa", dpa, x, wqkv, wproj)

    def pretransposed(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)  # [3,B,H,N,D]
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = jax.lax.dot_general(q * (D ** -0.5), k,
                                (((3,), (3,)), ((0, 1), (0, 1))),
                                preferred_element_type=BF16)
        a = jax.nn.softmax(a, -1)
        o = jax.lax.dot_general(a, v, (((3,), (2,)), ((0, 1), (0, 1))))
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("pretransposed_dotgeneral", pretransposed, x, wqkv, wproj)

    # fp32 softmax version of current, for the delta
    def current_f32(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = jnp.einsum("bnhd,bmhd->bhnm", q * (D ** -0.5), k,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(BF16)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("current_f32softmax", current_f32, x, wqkv, wproj)

    # matmuls only (qkv + proj), no attention core: the floor
    def mm_only(x, wqkv, wproj):
        qkv = jnp.dot(x, wqkv, preferred_element_type=BF16)
        o = qkv[..., :C]
        return jnp.dot(o, wproj, preferred_element_type=BF16).sum()

    timed("qkv_proj_matmuls_only", mm_only, x, wqkv, wproj)


if __name__ == "__main__":
    main()
