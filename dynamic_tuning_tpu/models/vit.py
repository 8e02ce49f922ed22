"""DyT VisionTransformer (image), TPU-native.

Behavioral spec from the reference ``models/vision_transformer_IN21K.py``:
  * patch embed (16x16 conv) + CLS token + learnable pos-embed (:343-352)
  * 12 DyT blocks; block i routes iff ``select_config.open and
    i >= select_config.keep_layers`` (:311)
  * per-block gates stacked to [B, L, T, 1] and CLS stripped (:355-368)
  * final LN, CLS-token (or mean) pooling, linear head (:375-385)
  * ``forward(x, complete_model)`` -> (logits, {token_select, token_logits})

TPU-first notes: the residual stream is kept fp32 while matmuls run bf16
(AMP parity); everything is static-shape so the whole student+teacher train
step compiles to one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import remat_block_cls, trunc_normal_02

Dtype = Any


class _ConvParams(nn.Module):
    """Raw kernel/bias with nn.Conv's tree names and inits (int8 path)."""

    kh: int
    kw: int
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_02,
                       (self.kh, self.kw, self.in_ch, self.out_ch),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.out_ch,),
                       jnp.float32)
        return k, b


class PatchEmbed(nn.Module):
    """16x16 non-overlapping conv patch embedding."""

    patch_size: int = 16
    embed_dim: int = 768
    quant: str = "none"     # "int8"/"int8_attn": s8xs8 stem conv (serving)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        p = self.patch_size
        if self.quant in ("int8", "int8_attn") and not training:
            # serving int8 stem (shared s8xs8 conv, ops/quant.py::q8_conv:
            # per-channel weights x per-sample activations — normalized
            # images are tightly bounded so one scale per image loses
            # nothing, and per-sample keeps logits batch-invariant)
            from dynamic_tuning_tpu.ops.quant import q8_conv

            w, b = _ConvParams(p, p, x.shape[-1], self.embed_dim,
                               name="proj")()
            x = (q8_conv(x, w, strides=(p, p), padding="VALID")
                 + b).astype(self.dtype)
        else:
            x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                        padding="VALID", dtype=self.dtype,
                        kernel_init=trunc_normal_02, name="proj")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class VisionTransformer(nn.Module):
    """DyT ViT.  Input images are NHWC float (normalized)."""

    cfg: ModelConfig
    tuning: TuningConfig = TuningConfig()
    select: SelectConfig = SelectConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False,
                 complete_model: bool = False, dispatch: bool = False
                 ) -> Tuple[jax.Array, Dict[str, Optional[jax.Array]]]:
        cfg = self.cfg
        B = x.shape[0]

        if self.select.open and not cfg.class_token:
            # TokenSelect scores x[:, 1:], the dispatcher force-keeps
            # position 0, and the gate stack / FLOPs accounting strip it as
            # CLS — without a CLS token those semantics silently corrupt the
            # budget (first patch unroutable, keep_ratio/GFLOPs skewed).
            # The reference likewise only routes with CLS present
            # (models/dynamic_adapter.py:58-77).
            raise ValueError(
                "token routing (select.open=True) requires class_token=True;"
                " use select.open=False for CLS-free (avg-pool) models")
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, quant=cfg.quant,
                       dtype=self.dtype,
                       name="patch_embed")(x.astype(self.dtype),
                                           training=training)
        x = x.astype(jnp.float32)

        if cfg.class_token:
            cls = self.param("cls_token",
                             nn.initializers.normal(stddev=1e-6),
                             (1, 1, cfg.embed_dim), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)), x],
                                axis=1)

        pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                         (1, cfg.seq_len, cfg.embed_dim), jnp.float32)
        x = x + pos
        x = nn.Dropout(cfg.pos_drop_rate)(x, deterministic=not training)
        # residual-stream dtype: fp32 matches the reference's AMP type
        # promotion; bf16 halves HBM traffic for inference
        x = x.astype(jnp.dtype(cfg.residual_dtype))

        gates, logits_all = [], []
        # stochastic-depth decay rule; static python floats (not traced)
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
               for i in range(cfg.depth)]
        block_cls = remat_block_cls(cfg.remat, training)
        for i in range(cfg.depth):
            sel = self.select.open and i >= self.select.keep_layers
            x, gate, logits = block_cls(
                num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, proj_drop=cfg.proj_drop_rate,
                attn_drop=cfg.attn_drop_rate, drop_path=dpr[i], select=sel,
                gelu_approx=cfg.gelu_approx, quant=cfg.quant,
                tuning=self.tuning, select_cfg=self.select, dtype=self.dtype,
                name=f"blocks_{i}")(x, training, complete_model, dispatch)
            if gate is not None:
                gates.append(gate)
                logits_all.append(logits)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

        if cfg.global_pool == "avg":
            pooled = x[:, 1 if cfg.class_token else 0:].mean(axis=1)
        else:
            pooled = x[:, 0]
        pooled = nn.Dropout(cfg.drop_rate)(pooled, deterministic=not training)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                          kernel_init=trunc_normal_02, name="head")(pooled)

        if gates:
            # [B, L, T, 1]; strip CLS from the gate stack (reference :367)
            token_select = jnp.stack(gates, axis=1)[:, :, 1:, :]
            token_logits = jnp.stack(logits_all, axis=1)
        else:
            token_select, token_logits = None, None
        return logits, dict(token_select=token_select, token_logits=token_logits)


def with_tau(model, tau: float):
    """Gate-temperature scheduling hook (reference ``set_tau``,
    models/dynamic_adapter.py:67 — vestigial there: the mains never call
    it).  Functional-JAX analogue of mutating module state: returns a clone
    of the model whose routers sample at the new temperature.  Changing tau
    mid-run triggers one re-jit of the train step — the TPU-native cost of
    a schedule knob that is static inside the compiled program.

    Works for any DyT model carrying a ``select`` config (image, video,
    segmentation backbones)."""
    import dataclasses

    return model.clone(select=dataclasses.replace(model.select, tau=tau))


def vit_base_patch16_224_in21k(num_classes: int = 1000,
                               tuning: TuningConfig = TuningConfig(),
                               select: SelectConfig = SelectConfig(),
                               dtype: Dtype = jnp.bfloat16,
                               **overrides) -> VisionTransformer:
    """ViT-B/16 factory (reference vision_transformer_IN21K.py:414-421)."""
    cfg = ModelConfig(num_classes=num_classes, **overrides)
    return VisionTransformer(cfg, tuning=tuning, select=select, dtype=dtype)
