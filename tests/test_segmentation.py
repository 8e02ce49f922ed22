"""Segmentation stack tests (backbone+FPN, UperNet, loss, slide inference,
mIoU) — reference dense_tasks/Segmentation/."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
from dynamic_tuning_tpu.models.upernet import (DyTSegmentor, seg_loss,
                                               slide_inference)
from dynamic_tuning_tpu.utils.metrics import confusion_matrix, miou_from_confusion


def _tiny_cfg():
    return ModelConfig(img_size=64, patch_size=8, embed_dim=64, depth=4,
                       num_heads=4)


def test_backbone_feature_pyramid_shapes():
    cfg = _tiny_cfg()
    bb = SegVisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(),
                              out_indices=(0, 1, 2, 3), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = bb.init(jax.random.PRNGKey(1), x)["params"]
    feats, aux = bb.apply({"params": params}, x)
    # strides 2/4/8/16 of the 8x8 patch grid: 32^2, 16^2, 8^2, 4^2
    assert feats[0].shape == (2, 32, 32, 64)
    assert feats[1].shape == (2, 16, 16, 64)
    assert feats[2].shape == (2, 8, 8, 64)
    assert feats[3].shape == (2, 4, 4, 64)
    assert aux["loss"].shape == ()
    assert aux["token_select"].shape == (2, 4, 64, 1)
    # rel-pos-bias table exists (use_rel_pos_bias default True)
    assert "relative_position_bias_table" in params["blocks_0"]["attn"]


def test_backbone_rel_pos_bias_table_size():
    from dynamic_tuning_tpu.models.layers import _relative_position_index
    idx, size = _relative_position_index(8, 8)
    assert size == 15 * 15 + 3
    assert idx.shape == (65, 65)
    assert idx[0, 0] == 15 * 15
    assert idx.max() < size


def test_segmentor_forward_and_loss():
    cfg = _tiny_cfg()
    seg = DyTSegmentor(cfg, num_classes=7,
                       tuning=TuningConfig(ffn_num=8, d_model=64),
                       select=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = seg.init(jax.random.PRNGKey(1), x)["params"]
    logits, aux_logits, aux = seg.apply({"params": params}, x)
    assert logits.shape == (2, 64, 64, 7)
    assert aux_logits.shape == (2, 64, 64, 7)

    labels = jnp.asarray(np.random.RandomState(0).randint(0, 7, (2, 64, 64)))
    labels = labels.at[0, :8].set(255)   # ignore region
    total, parts = seg_loss(logits, aux_logits, labels, aux["loss"])
    assert np.isfinite(float(total))
    recompose = parts["decode_loss"] + 0.4 * parts["aux_loss"] + parts["token_loss"]
    assert abs(float(total) - float(recompose)) < 1e-6


def test_seg_loss_ignores_255():
    logits = jnp.zeros((1, 4, 4, 3))
    aux = jnp.zeros((1, 4, 4, 3))
    all_ignore = jnp.full((1, 4, 4), 255)
    total, parts = seg_loss(logits, aux, all_ignore, jnp.zeros(()))
    assert float(parts["decode_loss"]) == 0.0


def test_slide_inference_covers_image():
    cfg = _tiny_cfg()
    seg = DyTSegmentor(cfg, num_classes=5,
                       tuning=TuningConfig(ffn_num=8, d_model=64),
                       select=SelectConfig(), dtype=jnp.float32)
    x64 = jnp.zeros((1, 64, 64, 3))
    params = seg.init(jax.random.PRNGKey(1), x64)["params"]

    def apply_fn(p, tile):
        return seg.apply({"params": p}, tile)[0]

    img = jax.random.normal(jax.random.PRNGKey(2), (100, 150, 3))
    out = slide_inference(apply_fn, params, img, num_classes=5, crop=64,
                          stride=48)
    assert out.shape == (100, 150, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_miou_accumulation():
    pred = np.array([[0, 0, 1, 1], [2, 2, 1, 0]])
    label = np.array([[0, 0, 1, 2], [2, 2, 255, 0]])
    cm = confusion_matrix(pred, label, 3)
    miou, per_class = miou_from_confusion(cm)
    # class0: inter 3 / union 3; class1: 1/2; class2: 2/3
    expect = np.mean([1.0, 0.5, 2 / 3]) * 100
    assert abs(miou - expect) < 1e-6


def test_conv_module_int8_parity_and_tree():
    """ConvModule quant=int8: same param tree as the fp path, bounded
    output drift (per-tensor activation scale x per-channel weights)."""
    import numpy as np
    from dynamic_tuning_tpu.models.upernet import ConvModule

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
    m_fp = ConvModule(64, 3, dtype=jnp.float32)
    m_q8 = ConvModule(64, 3, quant="int8", dtype=jnp.float32)
    p = m_fp.init(jax.random.PRNGKey(1), x)["params"]
    p2 = m_q8.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))
    a = np.asarray(m_fp.apply({"params": p}, x))
    b = np.asarray(m_q8.apply({"params": p}, x))
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel
    # training path is the fp conv exactly
    c = np.asarray(m_q8.apply({"params": p}, x, training=True))
    d = np.asarray(m_fp.apply({"params": p}, x, training=True))
    np.testing.assert_array_equal(c, d)


def test_segmentor_int8_head_drift(monkeypatch):
    import numpy as np
    import dataclasses
    from dynamic_tuning_tpu.models.upernet import DyTSegmentor

    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    cfg = ModelConfig(img_size=64, patch_size=16, embed_dim=64, depth=4,
                      num_heads=2, num_classes=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    m_fp = DyTSegmentor(cfg, num_classes=8,
                        tuning=TuningConfig(ffn_num=8, d_model=64),
                        select=SelectConfig(), dtype=jnp.float32)
    m_q8 = DyTSegmentor(dataclasses.replace(cfg, quant="int8"), num_classes=8,
                        tuning=TuningConfig(ffn_num=8, d_model=64),
                        select=SelectConfig(), dtype=jnp.float32)
    p = m_fp.init(jax.random.PRNGKey(1), x)["params"]
    p2 = m_q8.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))
    a, _, _ = m_fp.apply({"params": p}, x)
    b, _, _ = m_q8.apply({"params": p}, x)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9) < 0.1


def test_segmentor_head_channels_opt_in():
    """--seg_head_channels: opt-in narrow UPerHead (deviation from the
    reference our_vit.py channels=768 config; the head is flop-bound, see
    BENCH.md).  Default stays reference parity; the narrow head changes
    only decode_head param shapes and keeps the output contract."""
    cfg = _tiny_cfg()
    tun = TuningConfig(ffn_num=8, d_model=64)
    ref = DyTSegmentor(cfg, num_classes=7, tuning=tun,
                       select=SelectConfig(), dtype=jnp.float32)
    slim = DyTSegmentor(cfg, num_classes=7, tuning=tun,
                        select=SelectConfig(), head_channels=32,
                        dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    p_ref = ref.init(jax.random.PRNGKey(1), x)["params"]
    p_slim = slim.init(jax.random.PRNGKey(1), x)["params"]

    # default = reference parity: bottleneck conv carries embed_dim channels
    k_ref = p_ref["decode_head"]["fpn_bottleneck"]["conv"]["kernel"]
    k_slim = p_slim["decode_head"]["fpn_bottleneck"]["conv"]["kernel"]
    assert k_ref.shape[-1] == cfg.embed_dim
    assert k_slim.shape[-1] == 32
    # backbone + aux head untouched
    assert jax.tree_util.tree_structure(p_ref["backbone"]) == \
        jax.tree_util.tree_structure(p_slim["backbone"])

    logits, aux_logits, _ = slim.apply({"params": p_slim}, x)
    assert logits.shape == (2, 64, 64, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_adaptive_avg_pool_matches_torch_nondivisible():
    """PSP pooling at the standard crop hits non-divisible scales (16x16
    feature, scales 3 and 6); the variable-window matrix path must equal
    torch AdaptiveAvgPool2d exactly, not a bilinear approximation
    (review finding; reference mmseg PPM uses nn.AdaptiveAvgPool2d)."""
    import torch

    from dynamic_tuning_tpu.models.upernet import _adaptive_avg_pool

    rs = np.random.RandomState(0)
    for hw, out in [(16, 3), (16, 6), (16, 1), (16, 2), (15, 4), (7, 5)]:
        x = rs.randn(2, hw, hw, 5).astype(np.float32)
        got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), out))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), out
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_uperhead_matches_torch_oracle():
    """Full UPerHead vs an independent torch replica over the same params:
    pins the PSP adaptive pooling (incl. non-divisible and out>in scales),
    the bilinear resizes (align_corners=False semantics), SAME conv padding,
    GroupNorm(32, eps=1e-6) and the FPN top-down wiring.  Complements the
    backbone oracle (tests/test_full_scale_seg_video.py); reference head:
    mmseg UPerHead (dense_tasks/Segmentation config our_vit.py)."""
    import torch
    import torch.nn.functional as F

    from dynamic_tuning_tpu.models.upernet import UPerHead

    C, NC = 64, 7
    head = UPerHead(NC, channels=C, dtype=jnp.float32)
    rs = np.random.RandomState(3)
    # real stride-4/8/16/32 geometry at half the 512-crop scale: every
    # _resize in the head UPSAMPLES (as at any crop size), where jax and
    # torch bilinear agree; jax antialiases on DOWNSCALE where torch
    # doesn't, but no live head path downscales.  PSP on 8x8 exercises
    # the non-divisible pool scales (3, 6).
    feats = [jnp.asarray(rs.randn(1, s, s, C).astype(np.float32))
             for s in (64, 32, 16, 8)]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    # non-trivial norm affines so GN semantics are actually exercised
    params = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(v.size).randn(*v.shape)
        .astype(np.float32), params)
    got = np.asarray(head.apply({"params": params}, feats))

    def t(p, *path):
        v = params
        for k in path:
            v = v[k]
        return torch.from_numpy(np.asarray(v))

    def conv_module(x, *path, k=3):
        w = t(params, *path, "conv", "kernel").permute(3, 2, 0, 1)
        x = F.conv2d(x, w, padding=k // 2)
        x = F.group_norm(x, 32, t(params, *path, "gn", "scale"),
                         t(params, *path, "gn", "bias"), eps=1e-6)
        return F.relu(x)

    def up(x, hw):
        return F.interpolate(x, size=hw, mode="bilinear",
                             align_corners=False)

    tf = [torch.from_numpy(np.asarray(f)).permute(0, 3, 1, 2) for f in feats]
    # PSP
    outs = [tf[-1]]
    for i, s in enumerate((1, 2, 3, 6)):
        p = F.adaptive_avg_pool2d(tf[-1], s)
        p = conv_module(p, "psp", f"pool_{i}", k=1)
        outs.append(up(p, tf[-1].shape[2:]))
    psp = conv_module(torch.cat(outs, 1), "psp", "bottleneck")
    # FPN
    lats = [conv_module(tf[i], f"lateral_{i}", k=1) for i in range(3)]
    lats.append(psp)
    for i in range(3, 0, -1):
        lats[i - 1] = lats[i - 1] + up(lats[i], lats[i - 1].shape[2:])
    fpn = [conv_module(lats[i], f"fpn_{i}") for i in range(3)]
    fpn.append(lats[3])
    fpn = [up(o, fpn[0].shape[2:]) for o in fpn]
    fused = conv_module(torch.cat(fpn, 1), "fpn_bottleneck")
    w = t(params, "conv_seg", "kernel").permute(3, 2, 0, 1)
    ref = F.conv2d(fused, w, t(params, "conv_seg", "bias"))
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_slide_inference_tile_batch_identical():
    """tile_batch > 1 batches window tiles per forward (MXU utilization /
    fewer dispatches) but must be numerically identical to the reference
    one-tile-at-a-time semantics, including the weight-0 padding tiles."""
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(40, 56, 3).astype(np.float32))

    def apply_fn(params, tiles):   # fake segmentor: linear in the tile
        return jnp.tanh(tiles @ params)[..., :5]

    params = jnp.asarray(rs.randn(3, 8).astype(np.float32))
    ref = slide_inference(apply_fn, params, img, num_classes=5, crop=16,
                          stride=11, tile_batch=1)
    # 7 forces weight-0 padding (12 tiles total); 50 > n_tiles exercises
    # the clamp-to-tile-count path (a 1-window image must not pay tb x
    # compute — measured 0.39x at 512^2/tb=4 before the clamp)
    for tb in (2, 3, 7, 50):
        got = slide_inference(apply_fn, params, img, num_classes=5, crop=16,
                              stride=11, tile_batch=tb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
