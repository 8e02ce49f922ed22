"""Pos-embed utilities: sincos generator + video-tubelet interpolation
(reference util/pos_embed.py:20-104)."""

import numpy as np

from dynamic_tuning_tpu.parallel.multihost import maybe_initialize_distributed
from dynamic_tuning_tpu.utils.pos_embed import (get_2d_sincos_pos_embed,
                                                interpolate_pos_embed_video)


def test_sincos_shape_and_cls():
    pe = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    assert pe.shape == (17, 16)
    np.testing.assert_array_equal(pe[0], 0.0)
    # values bounded by sin/cos range
    assert np.abs(pe).max() <= 1.0


def test_sincos_distinct_positions():
    pe = get_2d_sincos_pos_embed(16, 4)
    assert len(np.unique(pe.round(5), axis=0)) == 16


def test_video_tubelet_interpolation():
    # ckpt: 8 frames / tubelet 2 -> 4 temporal x 4x4 spatial = 64 tokens
    pe = np.random.RandomState(0).randn(1, 64, 8).astype(np.float32)
    # per-frame spatial grid is 64/4 = 16 tokens -> same grid = passthrough
    out = interpolate_pos_embed_video(pe, new_num_patches=16, num_frames=8,
                                      tubelet_size=2)
    np.testing.assert_array_equal(out, pe)
    up = interpolate_pos_embed_video(pe, new_num_patches=256, num_frames=8,
                                     tubelet_size=2)
    assert up.shape == (1, 4 * 256, 8)           # temporal dim preserved


def test_maybe_initialize_noop_single_host():
    # no env vars set -> no-op, returns False (or True on an already-init pod)
    assert maybe_initialize_distributed() in (False, True)


def test_interpolate_pos_embed_matches_torch_bicubic():
    """Pos-embed grid resize vs the reference's F.interpolate(bicubic,
    align_corners=False) (util/pos_embed.py:106-127) for the live upsample
    direction (e.g. 14x14 IN21K grid -> larger fine-tune grid)."""
    import torch
    import torch.nn.functional as F

    from dynamic_tuning_tpu.utils.pos_embed import interpolate_pos_embed

    rs = np.random.RandomState(0)
    pe = rs.randn(1, 1 + 14 * 14, 24).astype(np.float32)
    got = interpolate_pos_embed(pe, 24 * 24)
    grid = torch.from_numpy(pe[:, 1:].reshape(1, 14, 14, 24)).permute(0, 3, 1, 2)
    ref = F.interpolate(grid, size=(24, 24), mode="bicubic",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(1, 24 * 24, 24).numpy()
    np.testing.assert_array_equal(got[:, :1], pe[:, :1])  # CLS passthrough
    np.testing.assert_allclose(got[:, 1:], ref, rtol=2e-5, atol=2e-5)


def test_interpolate_pos_embed_matches_torch_bicubic_downscale():
    """Downscale direction (fine-tune at lower res): torch bicubic does NOT
    antialias — the kernel matrix must reproduce that too."""
    import torch
    import torch.nn.functional as F

    from dynamic_tuning_tpu.utils.pos_embed import interpolate_pos_embed

    rs = np.random.RandomState(1)
    pe = rs.randn(1, 1 + 24 * 24, 16).astype(np.float32)
    got = interpolate_pos_embed(pe, 14 * 14)
    grid = torch.from_numpy(pe[:, 1:].reshape(1, 24, 24, 16)).permute(0, 3, 1, 2)
    ref = F.interpolate(grid, size=(14, 14), mode="bicubic",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(1, 14 * 14, 16).numpy()
    np.testing.assert_allclose(got[:, 1:], ref, rtol=2e-5, atol=2e-5)
