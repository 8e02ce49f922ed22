"""Line-item the NON-block serving residual (VERDICT r4 ask #4).

The per-block ledger (profile_int8_breakdown.py) bounds 12 blocks at
~7400 img/s while the bf16 dispatch headline is ~5534: something outside
the blocks costs ~45 us/img.  This script measures each non-block piece of
the flax serving forward (the exact headline path, bench.py config:
batch 128, bf16 residual, tanh GELU, fused serving attention) on its own:

  stem_conv     nn.Conv patch embed (XLA conv lowering), as benched today
  stem_matmul   reshape+matmul patch embed (fast_inference.py:183-190)
  stem_glue     cls concat + pos add + dtype casts
  head          final LN + CLS pool + classifier matmul
  block         one DyT block (dispatch) on a resident [B,197,C] bf16 tensor
  full          the whole model.apply (what bench.py times)

residual = full - stem - 12*block - head is then reported; if stem_matmul
beats stem_conv the stem rewrite is the first lever.

Run (TPU): python scripts/profile_serving_residual.py [--quant int8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_util import device_time

BATCH = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="none")
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()

    from dynamic_tuning_tpu.config import (ModelConfig, SelectConfig,
                                           TuningConfig)
    from dynamic_tuning_tpu.models.layers import Block
    from dynamic_tuning_tpu.models.vit import PatchEmbed, VisionTransformer

    B = args.batch
    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16", quant=args.quant)
    sel = SelectConfig(token_target_ratio=0.5)
    tun = TuningConfig()
    model = VisionTransformer(cfg, tuning=tun, select=sel,
                              dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    out = {"batch": B, "quant": args.quant}

    # --- full model (the headline path) --------------------------------
    # params ride as traced ARGUMENTS, never closure constants: baked-in
    # constants ship with every remote-compile request and a ViT-B tree
    # overflows the tunnel's body limit (HTTP 413, observed)
    def full(xx, p):
        logits, _ = model.apply({"params": p}, xx, dispatch=True)
        return logits

    t_full = device_time(full, x, params)
    out["full_ms"] = round(t_full * 1e3, 3)
    out["full_img_s"] = round(B / t_full, 1)

    # --- stem: conv vs reshape-matmul ----------------------------------
    pe = PatchEmbed(cfg.patch_size, cfg.embed_dim, quant=cfg.quant,
                    dtype=jnp.bfloat16)
    pe_params = {"params": {"proj": params["patch_embed"]["proj"]}}

    def stem_conv(xx, pp):
        return pe.apply(pp, xx.astype(jnp.bfloat16))

    ps = cfg.patch_size
    gh = 224 // ps
    kern = params["patch_embed"]["proj"]["kernel"].astype(jnp.bfloat16)
    kern2d = kern.reshape(ps * ps * 3, -1)
    bias = params["patch_embed"]["proj"]["bias"]

    def stem_matmul(xx):
        xb = xx.astype(jnp.bfloat16).reshape(B, gh, ps, gh, ps, 3)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gh, ps * ps * 3)
        t = jnp.dot(xb, kern2d, preferred_element_type=jnp.float32)
        return (t + bias).astype(jnp.bfloat16)

    out["stem_conv_us"] = round(device_time(stem_conv, x, pe_params) * 1e6, 1)
    out["stem_matmul_us"] = round(device_time(stem_matmul, x) * 1e6, 1)

    # --- stem glue: cls concat + pos add + casts ------------------------
    tokens = jnp.zeros((B, gh * gh, cfg.embed_dim), jnp.bfloat16)
    cls = params["cls_token"]
    pos = params["pos_embed"]

    def glue(tk, cc, pp):
        h = tk.astype(jnp.float32)
        h = jnp.concatenate(
            [jnp.broadcast_to(cc, (B, 1, cfg.embed_dim)), h], axis=1)
        return (h + pp).astype(jnp.bfloat16)

    out["stem_glue_us"] = round(
        device_time(glue, tokens, cls, pos) * 1e6, 1)

    # --- one block, resident tokens -------------------------------------
    N = cfg.seq_len
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, N, cfg.embed_dim),
                           jnp.bfloat16)
    blk = Block(num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, select=True,
                gelu_approx=True, quant=cfg.quant, tuning=tun,
                select_cfg=sel, dtype=jnp.bfloat16)
    bp = {"params": params["blocks_0"]}

    def block(hh, pp):
        y, _, _ = blk.apply(pp, hh, False, False, True)
        return y

    t_block = device_time(block, h0, bp)
    out["block_us"] = round(t_block * 1e6, 1)

    # --- head: final LN + pool + classifier -----------------------------
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    lnp = {"params": params["norm"]}
    hk = params["head"]["kernel"]
    hb = params["head"]["bias"]

    def head(hh, kk, bb):
        z = ln.apply(lnp, hh)
        return jnp.dot(z[:, 0], kk, preferred_element_type=jnp.float32) + bb

    out["head_us"] = round(device_time(head, h0, hk, hb) * 1e6, 1)

    # --- attribution ------------------------------------------------------
    blocks_ms = 12 * t_block * 1e3
    stem_ms = (out["stem_conv_us"] + out["stem_glue_us"]) / 1e3
    head_ms = out["head_us"] / 1e3
    out["blocks12_ms"] = round(blocks_ms, 3)
    out["residual_ms"] = round(out["full_ms"] - blocks_ms - stem_ms
                               - head_ms, 3)
    out["blocks_only_img_s"] = round(B / (blocks_ms / 1e3), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
