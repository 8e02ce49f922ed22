"""JAX RandAugment / RandomErasing tests (reference rand_augment.py,
random_erasing.py).  PIL is the oracle for the photometric ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from dynamic_tuning_tpu.data import randaugment as RA


@pytest.fixture(scope="module")
def img():
    rs = np.random.RandomState(0)
    return rs.randint(0, 256, (32, 32, 3), np.uint8)


def _f(x):
    return jnp.asarray(x, jnp.float32)


def test_invert_matches_pil(img):
    ours = np.asarray(RA.invert(_f(img), None)).astype(np.uint8)
    ref = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_array_equal(ours, ref)


def test_solarize_matches_pil(img):
    ours = np.asarray(RA.solarize(_f(img), jnp.float32(128))).astype(np.uint8)
    ref = np.asarray(ImageOps.solarize(Image.fromarray(img), 128))
    np.testing.assert_array_equal(ours, ref)


def test_posterize_matches_pil(img):
    ours = np.asarray(RA.posterize(_f(img), jnp.float32(3))).astype(np.uint8)
    ref = np.asarray(ImageOps.posterize(Image.fromarray(img), 3))
    np.testing.assert_array_equal(ours, ref)


def test_brightness_matches_pil(img):
    ours = np.asarray(RA.brightness(_f(img), jnp.float32(1.4)))
    ref = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(1.4))
    assert np.abs(ours - ref).max() <= 1.0   # PIL rounds, we keep float


def test_equalize_matches_pil(img):
    ours = np.asarray(RA.equalize(_f(img), None)).astype(np.uint8)
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(ours, ref)


def test_autocontrast_full_range_identity(img):
    # an image already spanning 0..255 per channel is unchanged
    x = img.copy()
    x[0, 0] = 0
    x[0, 1] = 255
    ours = np.asarray(RA.auto_contrast(_f(x), None))
    np.testing.assert_allclose(ours, x.astype(np.float32), atol=1e-3)


def test_rotate_zero_is_identity(img):
    ours = np.asarray(RA.rotate(_f(img), jnp.float32(0)))
    np.testing.assert_allclose(ours, img.astype(np.float32), atol=1e-2)


def test_translate_shifts_content(img):
    out = np.asarray(RA.translate_x(_f(img), jnp.float32(8)))
    # inverse-map translate: output[y, x] = input[y, x+8]
    np.testing.assert_allclose(out[:, :24], img[:, 8:].astype(np.float32),
                               atol=1e-2)
    assert np.allclose(out[:, 24:], RA.FILL)


def test_rand_augment_batch_runs_and_varies(img):
    batch = jnp.asarray(np.stack([img] * 4))
    out = RA.rand_augment_batch(jax.random.PRNGKey(0), batch,
                                config="rand-m7-n4-mstd0.5-inc1")
    assert out.shape == batch.shape and out.dtype == jnp.uint8
    outs = np.asarray(out)
    # different per-image rngs -> at least some images differ from each other
    assert any(not np.array_equal(outs[0], outs[i]) for i in range(1, 4))


def test_parse_config():
    assert RA.parse_config("rand-m7-n4-mstd0.5-inc1") == (7.0, 4, 0.5)
    assert RA.parse_config("rand-m9-mstd0.5") == (9.0, 2, 0.5)


def test_random_erasing_probability_and_box():
    img = jnp.zeros((16, 16, 3), jnp.float32)
    out_no = RA.random_erasing(jax.random.PRNGKey(3), img, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out_no), 0.0)
    out_yes = RA.random_erasing(jax.random.PRNGKey(3), img, prob=1.0)
    changed = np.asarray(out_yes) != 0
    assert changed.any()
    # erased region is a contiguous rectangle on each channel
    rows = np.where(changed.any(axis=(1, 2)))[0]
    cols = np.where(changed.any(axis=(0, 2)))[0]
    assert changed[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].any()
