"""BEiT alternative seg backbone tests (reference backbone/beit.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.seg_vit import beit_backbone


def test_beit_backbone_structure_and_forward():
    cfg = ModelConfig(img_size=64, patch_size=8, embed_dim=64, depth=4,
                      num_heads=4)
    bb = beit_backbone(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                       select=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = bb.init(jax.random.PRNGKey(1), x)["params"]

    # no absolute pos embed; q/v biases + zero-free k; layer-scale gammas
    assert "pos_embed" not in params
    attn = params["blocks_0"]["attn"]
    assert "q_bias" in attn and "v_bias" in attn
    assert "bias" not in attn["qkv"]
    assert "relative_position_bias_table" in attn
    np.testing.assert_allclose(np.asarray(params["blocks_0"]["ls1_gamma"]), 0.1)

    feats, aux = bb.apply({"params": params}, x)
    assert len(feats) == 4
    assert feats[2].shape == (2, 8, 8, 64)
    assert np.isfinite(np.asarray(feats[0])).all()


def test_beit_qv_bias_affects_output():
    cfg = ModelConfig(img_size=32, patch_size=8, embed_dim=64, depth=4,
                      num_heads=4)
    bb = beit_backbone(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                       select=SelectConfig(open=False), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = bb.init(jax.random.PRNGKey(1), x)["params"]
    f0, _ = bb.apply({"params": params}, x)
    params2 = jax.tree_util.tree_map(lambda v: v, params)
    params2["blocks_0"]["attn"]["q_bias"] = (
        params["blocks_0"]["attn"]["q_bias"] + 1.0)
    f1, _ = bb.apply({"params": params2}, x)
    assert not np.allclose(np.asarray(f0[0]), np.asarray(f1[0]))
