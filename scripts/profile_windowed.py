"""Windowed (seg/BEiT) serving attention: bias-aware Pallas kernel vs the XLA
branch at ADE20K slide-window shapes (N=1025, ViT-B heads)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.ops.mha_serving import mha_windowed_fused

B, N, H, hd = 4, 1025, 12, 64
C = H * hd


def xla_path(qkv, bias):
    q, k, v = jnp.moveaxis(
        qkv.reshape(B, N, 3, H, hd), 2, 0).transpose(0, 1, 3, 2, 4)
    s = jax.lax.dot_general(q * hd ** -0.5, k,
                            (((3,), (3,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32) + bias[None]
    p = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0).astype(qkv.dtype)
    o = jax.lax.dot_general(p, v, (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    return ((o / l).astype(qkv.dtype)
            .transpose(0, 2, 1, 3).reshape(B, N, C))


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qkv = jax.random.normal(k1, (B, N, 3 * C), jnp.bfloat16)
    bias = jax.random.normal(k2, (H, N, N), jnp.float32) * 0.5

    fused = lambda q, b: mha_windowed_fused(q, b, heads=H)
    ref = jax.jit(xla_path)
    err = jnp.max(jnp.abs(fused(qkv, bias).astype(jnp.float32)
                          - ref(qkv, bias).astype(jnp.float32)))
    print(f"max abs err: {err:.2e}")
    print(f"pallas windowed: {device_time(fused, qkv, bias)*1e3:8.3f} ms")
    print(f"xla branch     : {device_time(ref, qkv, bias)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
