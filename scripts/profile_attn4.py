"""Try JAX's bundled TPU flash-attention kernel on ViT shapes + the
scatter-add dispatch variant."""

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

    try:
        _ = float(many(*args))
    except Exception as e:
        print(json.dumps({"name": name, "error": repr(e)[:150]}), flush=True)
        return
    best = min(_t(many, args) for _ in range(3))
    print(json.dumps({"name": name, "us": round(best / ITERS * 1e6, 1),
                      "x12_ms": round(12 * best / ITERS * 1e3, 2)}), flush=True)


def _t(many, args):
    t0 = time.perf_counter()
    _ = float(many(*args))
    return time.perf_counter() - t0


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    key = jax.random.PRNGKey(0)
    # pad N to 256 for the kernel (it requires block-divisible seq lens)
    Np = 256
    q = jax.random.normal(key, (B, H, Np, D), BF16)
    k = jax.random.normal(key, (B, H, Np, D), BF16)
    v = jax.random.normal(key, (B, H, Np, D), BF16)

    bs = BlockSizes(block_q=256, block_k_major=256, block_k=256, block_b=1,
                    block_q_major_dkv=256, block_k_major_dkv=256,
                    block_k_dkv=256, block_q_dkv=256,
                    block_k_major_dq=256, block_k_dq=256, block_q_dq=256)

    def jax_flash(q, k, v):
        return flash_attention(q, k, v, sm_scale=D ** -0.5,
                               block_sizes=bs).sum()

    timed("jax_bundled_flash_256", jax_flash, q, k, v)

    def jax_flash_default(q, k, v):
        return flash_attention(q, k, v, sm_scale=D ** -0.5).sum()

    timed("jax_bundled_flash_defaultblocks", jax_flash_default, q, k, v)

    # scatter-add dispatch variant vs zeros+set
    x = jax.random.normal(key, (B, N, C), BF16)
    scores = jax.random.uniform(key, (B, N), jnp.float32)
    w1 = jax.random.normal(key, (C, 4 * C), BF16) * 0.02
    w2 = jax.random.normal(key, (4 * C, C), BF16) * 0.02
    K = 112

    def dispatch_set(x, scores, w1, w2):
        vv, idx = jax.lax.top_k(scores, K)
        b = jnp.arange(B)[:, None]
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        y = y * (vv > 0.5)[..., None]
        out = jnp.zeros_like(x).at[b, idx].set(y)
        return (x + out).sum()

    timed("dispatch_zeros_set_add", dispatch_set, x, scores, w1, w2)

    def dispatch_scatter_add(x, scores, w1, w2):
        vv, idx = jax.lax.top_k(scores, K)
        b = jnp.arange(B)[:, None]
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        y = y * (vv > 0.5)[..., None]
        out = x.at[b, idx].add(y)
        return out.sum()

    timed("dispatch_inplace_scatter_add", dispatch_scatter_add, x, scores,
          w1, w2)

    def mlp_full(x, scores, w1, w2):
        h = jnp.dot(x, w1, preferred_element_type=BF16)
        h = jax.nn.gelu(h, approximate=True)
        y = jnp.dot(h, w2, preferred_element_type=BF16)
        return (x + y).sum()

    timed("mlp_full_197", mlp_full, x, scores, w1, w2)


if __name__ == "__main__":
    main()
