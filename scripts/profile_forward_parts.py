"""Decompose the ViT-B serving forward into sublayer costs (RTT-free).

Each piece is timed standalone at bench shapes (B=128, N=197, C=768) and
multiplied by its per-forward count, to find the next optimization lever.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time

B, N, C, HID = 128, 197, 768, 3072
key = jax.random.PRNGKey(0)


def main():
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    w_qkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.02
    w_proj = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(key, (C, HID), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (HID, C), jnp.bfloat16) * 0.02
    img = jax.random.normal(key, (B, 224, 224, 3), jnp.bfloat16)
    wconv = jax.random.normal(key, (16, 16, 3, C), jnp.bfloat16) * 0.02

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    def qkv(x):
        return jnp.dot(x, w_qkv, preferred_element_type=jnp.bfloat16)

    qkv_out = jax.jit(qkv)(x)

    from dynamic_tuning_tpu.ops.mha_serving import mha_serving_fused
    def core(q):
        return mha_serving_fused(q, heads=12)

    def proj(x):
        return jnp.dot(x, w_proj, preferred_element_type=jnp.bfloat16)

    def mlp(x):
        h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    def adapter(x):
        wd = w1[:, :64]
        wu = w2[:64, :]
        h = jax.nn.relu(jnp.dot(x, wd, preferred_element_type=jnp.bfloat16))
        return jnp.dot(h, wu, preferred_element_type=jnp.bfloat16) * 0.1

    def patch(img):
        return jax.lax.conv_general_dilated(
            img, wconv, (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def select_head(x):
        w = w_proj[:, :1].astype(jnp.float32)
        return jax.nn.sigmoid(jnp.dot(x.astype(jnp.float32), w))

    parts = [
        ("LN (x3/block)", ln, (x,), 36),
        ("qkv dense", qkv, (x,), 12),
        ("mha core (pallas)", core, (qkv_out,), 12),
        ("out proj", proj, (x,), 12),
        ("mlp fc1+gelu+fc2", mlp, (x,), 12),
        ("adapter", adapter, (x,), 12),
        ("select head", select_head, (x,), 12),
        ("patch embed", patch, (img,), 1),
    ]
    total = 0.0
    for name, fn, args, count in parts:
        t = device_time(fn, *args)
        total += t * count
        print(f"{name:20s}: {t*1e3:7.3f} ms x{count:2d} = {t*count*1e3:7.2f} ms")
    print(f"{'SUM':20s}: {total*1e3:7.2f} ms   (bench dense fwd ~30.2 ms)")


if __name__ == "__main__":
    main()
