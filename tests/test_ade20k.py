"""ADE20K pipeline tests against a synthesized mini dataset on disk
(reference mmseg ADE20KDataset + train_pipeline semantics)."""

import numpy as np
import pytest
from PIL import Image

from dynamic_tuning_tpu.data.segmentation import ADE20KDataset, seg_normalize


@pytest.fixture(scope="module")
def ade_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("ade")
    rs = np.random.RandomState(0)
    for split in ["training", "validation"]:
        (d / "images" / split).mkdir(parents=True)
        (d / "annotations" / split).mkdir(parents=True)
        for i in range(3):
            img = rs.randint(0, 256, (120, 160, 3), np.uint8)
            ann = rs.randint(0, 5, (120, 160)).astype(np.uint8)
            ann[0, 0] = 0      # background -> must become 255 (ignore)
            Image.fromarray(img).save(d / "images" / split / f"im{i}.jpg")
            Image.fromarray(ann).save(d / "annotations" / split / f"im{i}.png")
    return str(d)


def test_train_sample_geometry_and_labels(ade_root):
    ds = ADE20KDataset(ade_root, "training", crop=64, train=True,
                       base_scale=(256, 64))
    assert len(ds) == 3
    img, ann = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert ann.shape == (64, 64) and ann.dtype == np.uint8
    valid = ann[ann != 255]
    assert valid.size > 0
    # reduce_zero_label: raw labels 1..4 -> 0..3
    assert valid.max() <= 3


def test_train_samples_stochastic(ade_root):
    """Augmentation draws are deterministic per (epoch, index) — thread-safe
    under the loader's worker pool — and fresh each epoch (the reference's
    DistributedSampler.set_epoch semantics)."""
    ds = ADE20KDataset(ade_root, "training", crop=64, train=True,
                       base_scale=(256, 64))
    a, _ = ds[0]
    b, _ = ds[0]
    np.testing.assert_array_equal(a, b)   # per-call seed: repeatable
    ds.set_epoch(1)
    c, _ = ds[0]
    assert not np.array_equal(a, c)       # random crop/flip/photometric


def test_eval_sample_keeps_aspect(ade_root):
    ds = ADE20KDataset(ade_root, "validation", crop=64, train=False,
                       base_scale=(256, 64))
    img, ann = ds[0]
    # mmseg protocol: the IMAGE is keep-ratio resized for inference, the
    # GT stays at ORIGINAL resolution (predictions resize back to
    # ori_shape before scoring — a downscaled GT deletes thin structures)
    assert ann.shape == (120, 160)
    # keep-ratio: 120x160 scaled so the short side ~64
    assert min(img.shape[:2]) == 64 or max(img.shape[:2]) == 256


def test_seg_normalize_mean_std():
    import jax.numpy as jnp

    x = jnp.full((2, 2, 3), 255, jnp.uint8)
    out = seg_normalize(x)
    np.testing.assert_allclose(np.asarray(out), (255 - 127.5) / 127.5,
                               rtol=1e-6)


def test_seg_resize_matches_cv2():
    """mmseg resizes with mmcv.imresize = cv2.resize; the numpy
    reimplementation must match it: INTER_NEAREST bit-exact (including
    cv2's 1/(dst/src) double arithmetic at integer boundaries),
    INTER_LINEAR within the fixed-point rounding (+-1)."""
    cv2 = pytest.importorskip("cv2")

    from dynamic_tuning_tpu.data.segmentation import _resize

    rs = np.random.RandomState(0)
    for (h, w) in [(100, 150), (333, 500)]:
        img = rs.randint(0, 256, (h, w, 3), np.uint8)
        ann = rs.randint(0, 150, (h, w), np.uint8)
        for scale in (0.5, 0.75, 1.3, 2.0):
            nh = max(int(h * scale + 0.5), 1)
            nw = max(int(w * scale + 0.5), 1)
            a = _resize(img, scale)
            b = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
            an = _resize(ann, scale, nearest=True)
            bn = cv2.resize(ann, (nw, nh), interpolation=cv2.INTER_NEAREST)
            np.testing.assert_array_equal(an, bn)


def test_hsv_roundtrip_matches_cv2():
    """PhotoMetricDistortion's HSV ops must match mmcv's (= cv2 uint8
    semantics: H in [0,180)); the numpy conversions are +-1 of cv2."""
    cv2 = pytest.importorskip("cv2")

    from dynamic_tuning_tpu.data.segmentation import (_hsv_to_rgb_u8,
                                                      _rgb_to_hsv_u8)

    img = np.random.RandomState(0).randint(0, 256, (64, 64, 3), np.uint8)
    h, s, v = _rgb_to_hsv_u8(img)
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    assert np.abs(h.astype(int) - ref[..., 0].astype(int)).max() <= 1
    assert np.abs(s.astype(int) - ref[..., 1].astype(int)).max() <= 1
    np.testing.assert_array_equal(v, ref[..., 2])
    back = _hsv_to_rgb_u8(ref[..., 0], ref[..., 1], ref[..., 2])
    ref_back = cv2.cvtColor(ref, cv2.COLOR_HSV2RGB)
    assert np.abs(back.astype(int) - ref_back.astype(int)).max() <= 1
