"""The ``residual_dtype`` serving knob must reach the block stack in ALL
three families.

Round-4 regression: the image model honored ``cfg.residual_dtype``
(vit.py) but video_vit/seg_vit hardcoded fp32 after the stem, so the
serving bench's ``residual_dtype="bfloat16"`` silently ran a double-width
residual stream for video/seg (one source of video's 1.21x vs image's
1.34x dispatch ratio in BENCH_r04).
"""

import jax
import jax.numpy as jnp
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig

TUN = TuningConfig(ffn_num=8, d_model=64)
SEL = SelectConfig(token_target_ratio=0.5)


def _block_out_dtype(model, x):
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    _, state = model.apply({"params": params}, x,
                           capture_intermediates=True, mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    outs = [leaf for path, leaf in flat
            if any(getattr(p, "key", None) == "blocks_0" for p in path)
            and hasattr(leaf, "dtype")]
    assert outs, "no blocks_0 intermediates captured"
    # first element of the Block return tuple is the residual stream
    return outs[0].dtype


@pytest.mark.parametrize("rdtype,expect", [("float32", jnp.float32),
                                           ("bfloat16", jnp.bfloat16)])
def test_image_residual_dtype(rdtype, expect):
    from dynamic_tuning_tpu.models.vit import VisionTransformer
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4, residual_dtype=rdtype)
    m = VisionTransformer(cfg, tuning=TUN, select=SEL, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    assert _block_out_dtype(m, x) == expect


@pytest.mark.parametrize("rdtype,expect", [("float32", jnp.float32),
                                           ("bfloat16", jnp.bfloat16)])
def test_video_residual_dtype(rdtype, expect):
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4, num_frames=2,
                      residual_dtype=rdtype)
    m = VideoVisionTransformer(cfg, tuning=TUN, select=SEL,
                               dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 32, 32, 3))
    assert _block_out_dtype(m, x) == expect


@pytest.mark.parametrize("rdtype,expect", [("float32", jnp.float32),
                                           ("bfloat16", jnp.bfloat16)])
def test_seg_residual_dtype(rdtype, expect):
    from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
    cfg = ModelConfig(img_size=64, patch_size=8, embed_dim=64, depth=4,
                      num_heads=4, residual_dtype=rdtype)
    m = SegVisionTransformer(cfg, tuning=TUN, select=SEL,
                             out_indices=(0, 1, 2, 3), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    assert _block_out_dtype(m, x) == expect
