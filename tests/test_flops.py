"""Analytic FLOPs table tests (reference block_flops_dict.py)."""

import numpy as np

from dynamic_tuning_tpu.ops import flops as F


def test_dense_vitb_is_about_17_6_gflops():
    """The reference hardcodes 17.6 GFLOPs for dense ViT-B/16 at 224^2
    (engine_finetune.py:345)."""
    g = F.dense_vit_flops(T=197, depth=12, dim=768, num_classes=1000)
    assert abs(g - 17.6) < 0.25, g


def test_base_flops_close_to_reference_constant():
    """Reference: 0.116438784 G for the IN21K variant with 100 classes
    (block_flops_dict.py:223-225) — our closed form lands within 1%."""
    g = F.base_flops(100) / 1e9
    assert abs(g - 0.116438784) / 0.116438784 < 0.01, g


def test_block_flops_affine_in_t():
    f0 = F.block_flops(197, 0)
    f1 = F.block_flops(197, 1)
    f100 = F.block_flops(197, 100)
    slope = f1 - f0
    assert f100 == f0 + 100 * slope
    assert slope == F.mlp_flops_per_token(768)


def test_get_block_flops_table_matches_closed_form():
    """The reference-parity token-count -> GFLOPs dict (reference
    get_block_flops keys, block_flops_dict.py:33-55) is exactly the
    closed-form block_flops at every count."""
    table = F.get_block_flops(T=197)
    assert set(table) == set(range(198))
    for t in (0, 1, 99, 197):
        assert table[t] == F.block_flops(197, t) / 1e9


def test_batch_select_flops_limits():
    # all gates on -> every block's MLP sees all 197 tokens
    ts_on = np.ones((2, 12, 196, 1), np.float32)
    g_on = F.batch_select_flops(ts_on, num_classes=100)
    expect_on = (12 * F.block_flops(197, 197) + F.base_flops(100)) / 1e9
    np.testing.assert_allclose(g_on, expect_on, rtol=1e-6)

    # all gates off -> only the CLS token per block
    ts_off = np.zeros((2, 12, 196, 1), np.float32)
    g_off = F.batch_select_flops(ts_off, num_classes=100)
    expect_off = (12 * F.block_flops(197, 1) + F.base_flops(100)) / 1e9
    np.testing.assert_allclose(g_off, expect_off, rtol=1e-6)
    assert (g_off < g_on).all()


def test_half_ratio_saves_about_30_percent():
    ts = np.zeros((1, 12, 196, 1), np.float32)
    ts[:, :, :98] = 1.0
    g = float(F.batch_select_flops(ts, num_classes=1000)[0])
    dense = F.dense_vit_flops(num_classes=1000)
    # skipping half the MLP tokens should save ~30% of total FLOPs
    assert 0.63 < g / dense < 0.75
