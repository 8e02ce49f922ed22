"""Full-scale torch-oracle parity for the seg (windowed/BEiT) and video
(attentive-pool) model families — the two VERDICT-r2 fixture variants
beyond the plain image ViT.

* Seg backbone at the reference's real operating shape: 512^2 crop,
  patch 16, N=1025 tokens, 12 blocks, 768 dim, windowed relative-position
  bias (reference dense_tasks/.../segmentation_vision_transformer_IN21K.py
  :150-195).  The torch oracle builds the bias via the reference's
  straightforward ``table[index]`` gather — an independent check of our
  Kronecker-structured build (models/layers._rel_pos_bias_from_table).
* BEiT backbone variant (q/v-only biases, LayerScale, no abs pos-embed;
  reference dense_tasks/.../backbone/beit.py) at a reduced shape — the
  BEiT options are per-block and orthogonal to N.
* Video ViT at 8 frames x 224^2 with the AttentiveBlock/CrossAttention
  pooling (reference video_vision_transformer_IN21K.py:27-110,436-481).

Params come straight from model.init (flax layout) shared bit-identically
with the torch oracle; routers are scaled so the thousands of hard gate
decisions carry margin (asserted) against cross-framework float noise.
Observed agreement at the pinned seeds: seg f3 3.7e-6, video logits 1e-7.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import _relative_position_index
from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

from torch_oracle import seg_backbone_oracle, video_oracle

pytestmark = pytest.mark.fullscale

DIM, HEADS, FFN = 768, 12, 64


def _randomize_blocks(params, rs, depth, router_scale=30.0, table_std=None):
    for i in range(depth):
        blk = params[f"blocks_{i}"]
        blk["mlp_token_select"]["mlp_head"]["kernel"] = (
            blk["mlp_token_select"]["mlp_head"]["kernel"] * router_scale)
        blk["adaptmlp"]["up_proj"]["kernel"] = jnp.asarray(
            rs.randn(FFN, DIM).astype(np.float32) * 0.02)
        if table_std is not None:
            tbl = blk["attn"]["relative_position_bias_table"]
            blk["attn"]["relative_position_bias_table"] = jnp.asarray(
                rs.randn(*tbl.shape).astype(np.float32) * table_std)
    return params


def _flat(params):
    return {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(params).items()}


def test_seg_backbone_full_shape_windowed():
    IMG, PATCH, B, DEPTH, SEED = 512, 16, 1, 12, 11
    GRID = IMG // PATCH
    cfg = ModelConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                      depth=DEPTH, num_heads=HEADS, num_classes=2)
    model = SegVisionTransformer(cfg, tuning=TuningConfig(ffn_num=FFN),
                                 select=SelectConfig(), dtype=jnp.float32)
    rs = np.random.RandomState(SEED)
    x = np.clip(rs.randn(B, IMG, IMG, 3), -2.6, 2.6).astype(np.float32)
    params = model.init(jax.random.PRNGKey(SEED), jnp.asarray(x))["params"]
    params = _randomize_blocks(params, rs, DEPTH, table_std=0.1)

    idx, tsize = _relative_position_index(GRID, GRID)
    assert params["blocks_0"]["attn"][
        "relative_position_bias_table"].shape[0] == tsize
    want_f3, want_gates, margin = seg_backbone_oracle(
        _flat(params), x, depth=DEPTH, heads=HEADS, patch=PATCH,
        window_index=idx, tap=7)
    # sanity floor only: 12288 gate decisions put the min |logit| near
    # 1e-4; observed cross-framework router noise is ~1e-6 and gates stay
    # bit-identical (asserted below) well past this margin
    assert margin > 1e-5, f"router margin too thin: {margin}"

    feats, aux = model.apply({"params": params}, jnp.asarray(x))
    f3 = np.asarray(feats[2]).reshape(B, GRID * GRID, DIM)
    scale = np.abs(want_f3).max()
    assert np.abs(f3 - want_f3).max() < 1e-3 * scale
    gates = np.asarray(aux["token_select"])[..., 0]
    np.testing.assert_array_equal(gates, want_gates)  # 12288 hard decisions
    assert 0.2 < gates.mean() < 0.8


def test_seg_backbone_beit_variant():
    """BEiT options (q/v-only attention biases, LayerScale gammas, no
    absolute pos-embed) — per-block features, checked at a lighter shape."""
    IMG, PATCH, B, DEPTH, SEED = 160, 16, 2, 4, 2
    GRID = IMG // PATCH
    cfg = ModelConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                      depth=DEPTH, num_heads=HEADS, num_classes=2)
    model = SegVisionTransformer(cfg, tuning=TuningConfig(ffn_num=FFN),
                                 select=SelectConfig(), dtype=jnp.float32,
                                 use_abs_pos_embed=False, init_values=0.5,
                                 qv_bias_only=True)
    rs = np.random.RandomState(SEED)
    x = np.clip(rs.randn(B, IMG, IMG, 3), -2.6, 2.6).astype(np.float32)
    params = model.init(jax.random.PRNGKey(SEED), jnp.asarray(x))["params"]
    params = _randomize_blocks(params, rs, DEPTH, table_std=0.1)
    for i in range(DEPTH):   # exercise the BEiT-only params off their init
        blk = params[f"blocks_{i}"]
        blk["attn"]["q_bias"] = jnp.asarray(
            rs.randn(DIM).astype(np.float32) * 0.02)
        blk["attn"]["v_bias"] = jnp.asarray(
            rs.randn(DIM).astype(np.float32) * 0.02)
        blk["ls1_gamma"] = jnp.asarray(
            0.5 + rs.randn(DIM).astype(np.float32) * 0.1)
        blk["ls2_gamma"] = jnp.asarray(
            0.5 + rs.randn(DIM).astype(np.float32) * 0.1)

    idx, _ = _relative_position_index(GRID, GRID)
    want_f3, want_gates, margin = seg_backbone_oracle(
        _flat(params), x, depth=DEPTH, heads=HEADS, patch=PATCH,
        window_index=idx, tap=DEPTH - 2, qv_bias_only=True, layer_scale=True,
        use_abs_pos=False)
    assert margin > 1e-5, f"router margin too thin: {margin}"

    feats, aux = model.apply({"params": params}, jnp.asarray(x))
    # tap index: out_indices at depth 4 -> feats[2] comes from block
    # default_out_indices(4)[2]
    from dynamic_tuning_tpu.models.seg_vit import default_out_indices
    assert default_out_indices(DEPTH)[2] == DEPTH - 2
    f3 = np.asarray(feats[2]).reshape(B, GRID * GRID, DIM)
    scale = np.abs(want_f3).max()
    assert np.abs(f3 - want_f3).max() < 1e-3 * scale
    np.testing.assert_array_equal(
        np.asarray(aux["token_select"])[..., 0], want_gates)


def test_video_full_shape_attentive_pool():
    IMG, PATCH, B, T, DEPTH, SEED = 224, 16, 1, 8, 12, 22
    cfg = ModelConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                      depth=DEPTH, num_heads=HEADS, num_classes=400,
                      num_frames=T)
    model = VideoVisionTransformer(cfg, tuning=TuningConfig(ffn_num=FFN),
                                   select=SelectConfig(), dtype=jnp.float32)
    rs = np.random.RandomState(SEED)
    x = np.clip(rs.randn(B, T, IMG, IMG, 3), -2.6, 2.6).astype(np.float32)
    # params are frame-count independent: init at T=1, apply at T=8
    params = model.init(jax.random.PRNGKey(SEED),
                        jnp.asarray(x[:, :1]))["params"]
    params = _randomize_blocks(params, rs, DEPTH)
    # exercise the attentive pool off its zero init
    params["query_token"] = jnp.asarray(
        rs.randn(1, 1, DIM).astype(np.float32) * 0.02)
    ca = params["attentive_blocks"]["cross_attn"]
    ca["q_bias"] = jnp.asarray(rs.randn(DIM).astype(np.float32) * 0.02)
    ca["v_bias"] = jnp.asarray(rs.randn(DIM).astype(np.float32) * 0.02)

    want, want_gates, margin = video_oracle(_flat(params), x, depth=DEPTH,
                                            heads=HEADS, patch=PATCH)
    assert margin > 1e-3, f"router margin too thin: {margin}"

    ours, aux = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-3)
    assert np.abs(np.asarray(ours) - want).max() < 1e-4  # headroom on record
    gates = np.asarray(aux["token_select"])[..., 0]     # [(B*T), L, N-1]
    np.testing.assert_array_equal(gates, want_gates)    # 18816 decisions
    assert 0.2 < gates.mean() < 0.8
