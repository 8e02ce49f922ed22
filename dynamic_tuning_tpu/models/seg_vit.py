"""DyT segmentation backbone: ViT features + simpleFPN pyramid.

Behavioral spec from the reference
``dense_tasks/Segmentation/backbone/segmentation_vision_transformer_IN21K.py``:
  * DyT blocks (mask-multiply skipping always on, :289-291) with optional
    relative-position-bias attention over the full patch grid (:150-195,
    enabled by ``use_rel_pos_bias`` in configs/beit/upernet/our_vit.py);
  * features tapped at ``out_indices=[3, 5, 7, 11]`` and reshaped to 2-D maps
    (:549-551);
  * simpleFPN necks: fpn1 = 4x deconv upsample, fpn2 = 2x deconv, fpn3 =
    identity, fpn4 = 2x2 maxpool (:435-445);
  * the token budget loss is computed INSIDE the backbone and returned with
    the features (:463-476, :559-560) — the segmentor merges it into the
    total loss.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import remat_block_cls, trunc_normal_02
from dynamic_tuning_tpu.models.vit import PatchEmbed
from dynamic_tuning_tpu.train.losses import token_budget_loss

Dtype = Any


def default_out_indices(depth: int) -> Tuple[int, ...]:
    """Reference default (3, 5, 7, 11) at depth 12 (:342); other depths use
    the quarter-point formula (deeper backbones must tap the full depth —
    e.g. depth 24 -> (5, 11, 17, 23), not the ViT-B indices)."""
    if depth < 4:
        raise ValueError(
            f"segmentation backbone needs >=4 blocks for the 4 FPN taps "
            f"(got depth={depth})")
    if depth == 12:
        return (3, 5, 7, 11)
    idx = tuple(sorted({max(0, depth * (k + 1) // 4 - 1) for k in range(4)}))
    return idx if len(idx) == 4 else tuple(range(max(0, depth - 4), depth))


class SegVisionTransformer(nn.Module):
    """Backbone forward: NHWC image -> 4 feature maps (strides 4/8/16/32)
    + token-select dict with the budget loss."""

    cfg: ModelConfig
    tuning: TuningConfig = TuningConfig()
    select: SelectConfig = SelectConfig()
    out_indices: Optional[Tuple[int, ...]] = None   # None -> derived
    use_rel_pos_bias: bool = True
    # BEiT-variant knobs (reference backbone/beit.py, the importable
    # alternative backbone): layer-scale, q/v-only attention biases, no
    # absolute pos-embed (rel-pos bias carries position)
    use_abs_pos_embed: bool = True
    init_values: Optional[float] = None
    qv_bias_only: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False,
                 complete_model: bool = False, dispatch: bool = False
                 ) -> Tuple[Tuple[jax.Array, ...], Dict[str, Optional[jax.Array]]]:
        cfg = self.cfg
        B, H, W, _ = x.shape
        hp, wp = H // cfg.patch_size, W // cfg.patch_size

        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, quant=cfg.quant,
                       dtype=self.dtype,
                       name="patch_embed")(x.astype(self.dtype),
                                           training=training)
        x = x.astype(jnp.float32)
        cls = self.param("cls_token", nn.initializers.normal(stddev=1e-6),
                         (1, 1, cfg.embed_dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)), x],
                            axis=1)
        if self.use_abs_pos_embed:
            pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                             (1, hp * wp + 1, cfg.embed_dim), jnp.float32)
            x = x + pos
        x = nn.Dropout(cfg.pos_drop_rate)(x, deterministic=not training)
        # residual-stream dtype knob, mirroring vit.py / video_vit.py (fp32
        # default preserves reference-AMP parity; bf16 is the serving mode)
        x = x.astype(jnp.dtype(cfg.residual_dtype))

        out_indices = (self.out_indices if self.out_indices is not None
                       else default_out_indices(cfg.depth))
        feats: List[jax.Array] = []
        gates, logits_all = [], []
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
               for i in range(cfg.depth)]
        # at N=1025 the fp32 score tensors are ~100 MB/block even at
        # batch 2, so remat="scores" matters here first
        block_cls = remat_block_cls(cfg.remat, training)
        for i in range(cfg.depth):
            sel = self.select.open and i >= self.select.keep_layers
            x, gate, logits = block_cls(
                num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, proj_drop=cfg.proj_drop_rate,
                attn_drop=cfg.attn_drop_rate, drop_path=dpr[i], select=sel,
                gelu_approx=cfg.gelu_approx, quant=cfg.quant,
                window_size=(hp, wp) if self.use_rel_pos_bias else None,
                init_values=self.init_values, qv_bias_only=self.qv_bias_only,
                tuning=self.tuning, select_cfg=self.select, dtype=self.dtype,
                name=f"blocks_{i}")(x, training, complete_model, dispatch)
            if gate is not None:
                gates.append(gate)
                logits_all.append(logits)
            if i in out_indices:
                feats.append(x[:, 1:, :].reshape(B, hp, wp, cfg.embed_dim))

        # simpleFPN necks (reference :435-445)
        f1 = nn.ConvTranspose(cfg.embed_dim, (2, 2), strides=(2, 2),
                              dtype=self.dtype, kernel_init=trunc_normal_02,
                              name="fpn1_deconv1")(feats[0].astype(self.dtype))
        f1 = nn.gelu(f1, approximate=False)
        f1 = nn.ConvTranspose(cfg.embed_dim, (2, 2), strides=(2, 2),
                              dtype=self.dtype, kernel_init=trunc_normal_02,
                              name="fpn1_deconv2")(f1)
        f2 = nn.ConvTranspose(cfg.embed_dim, (2, 2), strides=(2, 2),
                              dtype=self.dtype, kernel_init=trunc_normal_02,
                              name="fpn2_deconv")(feats[1].astype(self.dtype))
        f3 = feats[2]
        f4 = nn.max_pool(feats[3], (2, 2), strides=(2, 2))

        if gates:
            token_select = jnp.stack(gates, axis=1)[:, :, 1:, :]
            token_logits = jnp.stack(logits_all, axis=1)
            loss = self.select.token_loss_ratio * token_budget_loss(
                token_select, self.select)
        else:
            token_select, token_logits = None, None
            loss = jnp.zeros((), jnp.float32)
        aux = dict(token_select=token_select, token_logits=token_logits,
                   loss=loss)
        feats_out = tuple(f.astype(jnp.float32) for f in (f1, f2, f3, f4))
        return feats_out, aux


def beit_backbone(cfg: ModelConfig, tuning: TuningConfig = TuningConfig(),
                  select: SelectConfig = SelectConfig(),
                  dtype: Dtype = jnp.bfloat16) -> SegVisionTransformer:
    """BEiT-style alternative segmentation backbone (reference
    dense_tasks/Segmentation/backbone/beit.py): rel-pos-bias attention with
    q/v-only biases, LayerScale (init 0.1), no absolute pos-embed."""
    return SegVisionTransformer(cfg, tuning=tuning, select=select,
                                use_rel_pos_bias=True,
                                use_abs_pos_embed=False, init_values=0.1,
                                qv_bias_only=True, dtype=dtype)
