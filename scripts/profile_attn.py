"""Attention-variant shootout on TPU: stock einsum+fp32 softmax vs bf16
softmax vs padded vs Pallas flash kernel."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, N, D = 128, 12, 197, 64
ITERS = 100


def timed(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(a[0] + c * 1e-12, *a[1:])
            return out.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = min(_t(many, args) for _ in range(3))
    print(json.dumps({"name": name,
                      "us_per_iter": round(best / ITERS * 1e6, 1),
                      "x12_ms": round(12 * best / ITERS * 1e3, 2)}),
          flush=True)


def _t(many, args):
    t0 = time.perf_counter()
    _ = float(many(*args))
    return time.perf_counter() - t0


def main():
    from dynamic_tuning_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, N, D), jnp.bfloat16)

    def stock(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q * (D ** -0.5), k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v).sum()

    timed("stock_f32softmax", stock, q, k, v)

    def bf16sm(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q * (D ** -0.5), k,
                       preferred_element_type=jnp.bfloat16)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v).sum()

    timed("bf16_softmax", bf16sm, q, k, v)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 59), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 59), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 59), (0, 0)))

    def padded(qp, kp, vp):
        s = jnp.einsum("bhnd,bhmd->bhnm", qp * (D ** -0.5), kp,
                       preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < N, s, -jnp.inf)
        p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
        return jnp.einsum("bhnm,bhmd->bhnd", p, vp).sum()

    timed("padded256_f32softmax", padded, qp, kp, vp)

    def flash(q, k, v):
        return flash_attention(q, k, v).sum()

    timed("pallas_flash", flash, q, k, v)

    try:
        def jaxnn(q, k, v):
            # expects [B, N, H, D]
            o = jax.nn.dot_product_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))
            return o.sum()
        timed("jax_nn_dpa", jaxnn, q, k, v)
    except Exception as e:
        print("jax_nn_dpa failed:", repr(e)[:120])


if __name__ == "__main__":
    main()
