"""Video DyT VisionTransformer.

Behavioral spec from the reference ``video_models/video_vision_transformer_IN21K.py``:
  * time folds into batch before the patch embed (:436-437) — every DyT block
    runs per-frame, sharing the image Block/Adapter/TokenSelect;
  * after the final norm, tokens reshape to [B, T*N, D] and a zero-init
    ``query_token`` cross-attends over all frame tokens (AttentiveBlock,
    :27-49; CrossAttention with separate q/k/v projections, q/v biases only,
    :52-110); the pooled query goes to the head (:477-481);
  * gates are per-frame: token_select is [(B*T), L, N-1, 1].

Input layout here is TPU-native [B, T, H, W, C] (channels-last).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import remat_block_cls, trunc_normal_02
from dynamic_tuning_tpu.models.vit import PatchEmbed

Dtype = Any


class TubeletEmbed(nn.Module):
    """3-D (tubelet) patch embedding — the VideoMAE-family patch stem: one
    Conv over (tubelet, p, p) so each token covers ``tubelet`` frames.  The
    reference ships the matching pos-embed interpolation for these
    checkpoints (util/pos_embed.py:75-104); enable with
    ``ModelConfig(tubelet_size=2)``."""

    patch_size: int = 16
    tubelet_size: int = 2
    embed_dim: int = 768
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, H, W, C] -> [B, T // tubelet, gh * gw, D]."""
        t, p = self.tubelet_size, self.patch_size
        x = nn.Conv(self.embed_dim, (t, p, p), strides=(t, p, p),
                    padding="VALID", dtype=self.dtype,
                    kernel_init=trunc_normal_02, name="proj")(x)
        B, tg, gh, gw, D = x.shape
        return x.reshape(B, tg, gh * gw, D)


class CrossAttention(nn.Module):
    """Query-token cross-attention (reference CrossAttention :52-110):
    separate q/k/v projections; when qkv_bias, q and v carry biases while k's
    bias is fixed zero."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q_in: jax.Array, k_in: jax.Array, v_in: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        dim = q_in.shape[-1]
        head_dim = dim // self.num_heads
        scale = head_dim ** -0.5

        q = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="q")(q_in)
        k = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="k")(k_in)
        v = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="v")(v_in)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros_init(),
                                (dim,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros_init(),
                                (dim,), jnp.float32)
            q = q + q_bias.astype(q.dtype)
            v = v + v_bias.astype(v.dtype)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.num_heads, head_dim)
        k = k.reshape(B, Nk, self.num_heads, head_dim)
        v = v.reshape(B, Nk, self.num_heads, head_dim)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v)
        out = out.reshape(B, Nq, dim)
        out = nn.Dense(dim, dtype=self.dtype, kernel_init=trunc_normal_02,
                       name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class AttentiveBlock(nn.Module):
    """norm_q/norm_k/norm_v + cross-attention (reference :27-49)."""

    num_heads: int
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_q: jax.Array, x_kv: jax.Array,
                 *, deterministic: bool = True) -> jax.Array:
        q = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_q")(x_q)
        k = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_k")(x_kv)
        v = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_v")(x_kv)
        return CrossAttention(self.num_heads, self.qkv_bias, self.attn_drop,
                              self.drop, dtype=self.dtype, name="cross_attn")(
            q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
            deterministic=deterministic)


class VideoVisionTransformer(nn.Module):
    """Per-frame DyT ViT + attentive pooling head.  Input [B, T, H, W, C]."""

    cfg: ModelConfig
    tuning: TuningConfig = TuningConfig()
    select: SelectConfig = SelectConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False,
                 complete_model: bool = False, dispatch: bool = False
                 ) -> Tuple[jax.Array, Dict[str, Optional[jax.Array]]]:
        cfg = self.cfg
        B, T = x.shape[0], x.shape[1]
        if self.select.open and not cfg.class_token:
            # same silent budget corruption as the image model (see
            # VisionTransformer.__call__): routing semantics assume a CLS
            # token at position 0 of every frame group
            raise ValueError(
                "token routing (select.open=True) requires class_token=True;"
                " use select.open=False for CLS-free video models")
        if cfg.tubelet_size > 1:
            # VideoMAE-style tubelet stem: each token covers tubelet_size
            # frames; the per-frame DyT blocks then run per frame GROUP
            xg = TubeletEmbed(cfg.patch_size, cfg.tubelet_size,
                              cfg.embed_dim, dtype=self.dtype,
                              name="patch_embed")(x.astype(self.dtype))
            T = xg.shape[1]
            x = xg.reshape(B * T, xg.shape[2], cfg.embed_dim)
        else:
            x = x.reshape(B * T, *x.shape[2:])      # fold time into batch
            x = PatchEmbed(cfg.patch_size, cfg.embed_dim, quant=cfg.quant,
                           dtype=self.dtype,
                           name="patch_embed")(x.astype(self.dtype),
                                               training=training)
        x = x.astype(jnp.float32)

        if cfg.class_token:
            cls = self.param("cls_token", nn.initializers.normal(stddev=1e-6),
                             (1, 1, cfg.embed_dim), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B * T, 1, cfg.embed_dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                         (1, cfg.seq_len, cfg.embed_dim), jnp.float32)
        x = x + pos
        x = nn.Dropout(cfg.pos_drop_rate)(x, deterministic=not training)
        # residual-stream dtype: mirror vit.py (fp32 default = reference AMP
        # promotion; bf16 halves residual HBM for serving).  Was hardcoded
        # fp32 here while the image model honored the knob — the video
        # serving bench silently ran a double-width residual stream.
        x = x.astype(jnp.dtype(cfg.residual_dtype))

        gates, logits_all = [], []
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
               for i in range(cfg.depth)]
        # time folds into batch (B*T rows), so video training hits the
        # big-batch activation regime first — honor the remat knob
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
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=not training)

        # unfold time: all frame tokens attend to one learned query
        x = x.reshape(B, T * x.shape[1], cfg.embed_dim)
        query = self.param("query_token", nn.initializers.zeros_init(),
                           (1, 1, cfg.embed_dim), jnp.float32)
        pooled = AttentiveBlock(cfg.num_heads, cfg.qkv_bias, cfg.drop_rate,
                                cfg.attn_drop_rate, dtype=self.dtype,
                                name="attentive_blocks")(
            jnp.broadcast_to(query, (B, 1, cfg.embed_dim)), x,
            deterministic=not training)[:, 0, :]
        out = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                       kernel_init=trunc_normal_02, name="head")(
                           pooled.astype(jnp.float32))

        if gates:
            token_select = jnp.stack(gates, axis=1)[:, :, 1:, :]
            token_logits = jnp.stack(logits_all, axis=1)
        else:
            token_select, token_logits = None, None
        return out, dict(token_select=token_select, token_logits=token_logits)


def video_vit_base_patch16_224_in21k(num_classes: int = 400,
                                     num_frames: int = 8,
                                     tuning: TuningConfig = TuningConfig(),
                                     select: SelectConfig = SelectConfig(),
                                     dtype: Dtype = jnp.bfloat16,
                                     **overrides) -> VideoVisionTransformer:
    """Video ViT-B/16 factory (reference video_vision_transformer_IN21K.py:512)."""
    cfg = ModelConfig(num_classes=num_classes, num_frames=num_frames, **overrides)
    return VideoVisionTransformer(cfg, tuning=tuning, select=select, dtype=dtype)
