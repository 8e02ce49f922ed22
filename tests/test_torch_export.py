"""torch .pth export round-trip: export -> import must be bit-identical and
the importer must see zero missing backbone keys."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train import checkpoint as C


def test_export_import_roundtrip(tmp_path):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(), dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # non-trivial adapter weights so the DyT keys round-trip too
    params["blocks_0"]["adaptmlp"]["up_proj"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(1), (8, 64)))

    path = str(tmp_path / "export.pth")
    n = C.export_torch_state_dict(params, path)
    assert n > 30

    sd = C.load_torch_state_dict(path)
    fresh = model.init(jax.random.PRNGKey(2), x)["params"]
    restored, missing = C.import_pretrained(fresh, sd, logger=None)
    assert missing == []       # every param (incl. DyT) round-trips
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_exported_logits_identical(tmp_path):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    path = str(tmp_path / "m.pth")
    C.export_torch_state_dict(params, path)
    fresh = model.init(jax.random.PRNGKey(9), x)["params"]
    restored, _ = C.import_pretrained(fresh, C.load_torch_state_dict(path),
                                      logger=None)
    l1, _ = model.apply({"params": params}, x)
    l2, _ = model.apply({"params": restored}, x)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_video_tubelet_conv3d_export_roundtrip(tmp_path):
    """5-D tubelet kernels must invert DHWIO->OIDHW on export (regression:
    export used to skip 5-D, breaking the video checkpoint round-trip)."""
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=1, num_heads=4, num_frames=2, tubelet_size=2)
    model = VideoVisionTransformer(cfg, tuning=TuningConfig(ffn_num=8,
                                                            d_model=64),
                                   select=SelectConfig(), dtype=jnp.float32)
    x = jnp.zeros((1, 2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    k = params["patch_embed"]["proj"]["kernel"]
    assert k.ndim == 5                              # DHWIO

    path = str(tmp_path / "video.pth")
    C.export_torch_state_dict(params, path)
    sd = C.load_torch_state_dict(path)
    assert sd["patch_embed.proj.weight"].shape == (64, 3, 2, 8, 8)  # OIDHW
    fresh = model.init(jax.random.PRNGKey(2), x)["params"]
    restored, _ = C.import_pretrained(fresh, sd, logger=None)
    np.testing.assert_array_equal(
        np.asarray(restored["patch_embed"]["proj"]["kernel"]), np.asarray(k))
