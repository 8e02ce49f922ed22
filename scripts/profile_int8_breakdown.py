"""Where does the int8 dispatch forward spend its time?  Per-component
device times at bench shapes (B=128, ViT-B, keep 0.5 -> K=99)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_util import device_time

B, N, C, H, FFN, K = 128, 197, 768, 12, 64, 99


def main():
    from dynamic_tuning_tpu.ops.mha_serving import dyt_prologue_serving
    from dynamic_tuning_tpu.ops.quant import (dyt_prologue_serving_q8,
                                              q8_ln_mlp)

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, N, C), jnp.bfloat16)
    g, b = jnp.ones(C), jnp.zeros(C)
    wqkv = jax.random.normal(k, (C, 3 * C), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros(3 * C)
    wproj = jax.random.normal(k, (C, C), jnp.bfloat16) * 0.02
    bproj = jnp.zeros(C)
    wd = jax.random.normal(k, (C, FFN), jnp.bfloat16) * 0.05
    bd = jnp.zeros(FFN)
    wu = jax.random.normal(k, (FFN, C), jnp.bfloat16) * 0.05
    bu = jnp.zeros(C)
    wsel = jax.random.normal(k, (C, 1)) * 0.05
    bsel = jnp.zeros(1)

    t_pro_bf = device_time(
        lambda xx: dyt_prologue_serving(xx, g, b, wqkv, bqkv, wproj, bproj,
                                        wd, bd, wu, bu, 0.1, wsel, bsel,
                                        heads=H)[0], x)
    t_pro_q8 = device_time(
        lambda xx: dyt_prologue_serving_q8(xx, g, b, wqkv, bqkv, wproj,
                                           bproj, wd, bd, wu, bu, 0.1, wsel,
                                           bsel, heads=H)[0], x)
    rows = jax.random.normal(k, (B, K, C), jnp.bfloat16)
    w1 = jax.random.normal(k, (C, 4 * C), jnp.bfloat16) * 0.02
    b1 = jnp.zeros(4 * C)
    w2 = jax.random.normal(k, (4 * C, C), jnp.bfloat16) * 0.02
    b2 = jnp.zeros(C)
    t_mlp_q8 = device_time(
        lambda rr: q8_ln_mlp(rr, g, b, w1, b1, w2, b2, gelu_approx=True), rows)

    def mlp_bf(rr):
        ln = rr.astype(jnp.float32)
        mu = ln.mean(-1, keepdims=True)
        var = ((ln - mu) ** 2).mean(-1, keepdims=True)
        ln = ((ln - mu) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
        h = jax.nn.gelu(jnp.dot(ln, w1) + b1.astype(jnp.bfloat16),
                        approximate=True)
        return jnp.dot(h, w2) + b2.astype(jnp.bfloat16)
    t_mlp_bf = device_time(jax.jit(mlp_bf), rows)

    # dispatch permutation cost: one-hot gather+scatter with identity mlp
    from dynamic_tuning_tpu.ops.dispatch import onehot_dispatch_mlp
    scores = jax.random.uniform(k, (B, N))
    t_disp = device_time(
        jax.jit(lambda xx: onehot_dispatch_mlp(xx, scores, K,
                                               lambda r: r)[0]), x)

    blk_q8 = t_pro_q8 + t_mlp_q8 + t_disp
    print(f"prologue bf16 : {t_pro_bf*1e6:8.1f} us/block")
    print(f"prologue int8 : {t_pro_q8*1e6:8.1f} us/block")
    print(f"mlp K=99 bf16 : {t_mlp_bf*1e6:8.1f} us/block")
    print(f"mlp K=99 int8 : {t_mlp_q8*1e6:8.1f} us/block")
    print(f"dispatch perm : {t_disp*1e6:8.1f} us/block")
    print(f"int8 block    : {blk_q8*1e6:8.1f} us  -> x12 = "
          f"{12*blk_q8*1e3:.2f} ms; {B/(12*blk_q8):.0f} img/s block-bound")


if __name__ == "__main__":
    main()
