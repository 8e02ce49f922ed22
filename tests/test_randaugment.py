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
    assert RA.parse_config("rand-m7-n4-mstd0.5-inc1") == (7.0, 4, 0.5, True)
    # no inc token -> original (non-increasing) mappings
    assert RA.parse_config("rand-m9-mstd0.5") == (9.0, 2, 0.5, False)
    # the reference tests bool("0") on the token STRING (truthy), so inc0
    # ALSO selects the increasing transforms (rand_augment.py:521-523)
    assert RA.parse_config("rand-m9-n2-inc0")[3] is True
    with pytest.raises(NotImplementedError):
        RA.parse_config("rand-m9-w0")  # op weights: reference-only feature


def test_magnitude_families():
    """Posterize/Solarize truncate INSIDE the mapping (reference
    rand_augment.py:248-268) and flip direction between families."""
    r = jax.random.PRNGKey(0)
    # level 7 -> frac*4 = 2.8 -> inc keeps 4-2=2 bits (NOT int(4-2.8)=1)
    assert float(RA._magnitude("Posterize", jnp.float32(7.0), r, 32,
                               increasing=True)) == 2.0
    assert float(RA._magnitude("Posterize", jnp.float32(7.0), r, 32,
                               increasing=False)) == 2.0
    # level 8 -> frac*4 = 3.2 -> inc keeps 1 bit (never 0 below level 10)
    assert float(RA._magnitude("Posterize", jnp.float32(8.0), r, 32,
                               increasing=True)) == 1.0
    assert float(RA._magnitude("Solarize", jnp.float32(5.0), r, 32,
                               increasing=True)) == 128.0
    assert float(RA._magnitude("Solarize", jnp.float32(5.0), r, 32,
                               increasing=False)) == 128.0
    # non-increasing enhance sweeps 0.1..1.9 unsigned
    v = float(RA._magnitude("Color", jnp.float32(10.0), r, 32,
                            increasing=False))
    assert abs(v - 1.9) < 1e-6


def test_rand_augment_prob_half_skips_ops():
    """Reference AugmentOps carry prob=0.5 (rand_augment.py:463): with n=4
    some images must come through with ops skipped.  prob=0 must be the
    identity."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    ident = RA.rand_augment(jax.random.PRNGKey(1), img, magnitude=9.0,
                            num_ops=4, mstd=0.0, prob=0.0)
    np.testing.assert_array_equal(np.asarray(ident),
                                  np.asarray(img, np.float32))
    # with prob=0.5, across seeds at least one draw skips ALL 4 ops
    # (p = 1/16 per seed; 64 seeds -> P(none) ~ 1.6%)... use prob small
    # enough to make the skip-all event near-certain instead
    near_ident = RA.rand_augment(jax.random.PRNGKey(2), img, magnitude=9.0,
                                 num_ops=4, mstd=0.0, prob=1e-9)
    np.testing.assert_array_equal(np.asarray(near_ident),
                                  np.asarray(img, np.float32))


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


# --- bicubic warp (the video recipe's PIL BICUBIC, k400.py:133) --------------

def test_bicubic_identity_and_integer_translate(img):
    """The PIL-transform cubic at t=0 weights [1, 0], so identity and
    integer shifts must be EXACT (same property the bilinear path has)."""
    out = np.asarray(RA.rotate(_f(img), jnp.float32(0), order=3))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-2)

    out = np.asarray(RA.translate_x(_f(img), jnp.float32(8), order=3))
    np.testing.assert_allclose(out[:, :24], img[:, 8:].astype(np.float32),
                               atol=1e-2)
    assert np.allclose(out[:, 24:], RA.FILL)


def test_bicubic_fractional_translate_matches_pil(img):
    """PIL oracle on a pure fractional shift — translation is invariant to
    the rotation-center convention, so this pins the cubic KERNEL (the
    Pillow Geometry.c non-normalized 2-tap cubic + uint8 clamp) against
    PIL BICUBIC directly."""
    tx, ty = 3.25, -1.75
    ours = np.asarray(RA._affine(
        _f(img), jnp.array([[1.0, 0, tx], [0, 1.0, ty]]), order=3))
    coeffs = (1.0, 0.0, tx, 0.0, 1.0, ty)
    ref = np.asarray(Image.fromarray(img).transform(
        (32, 32), Image.AFFINE, coeffs, resample=Image.BICUBIC,
        fillcolor=(128, 128, 128))).astype(np.float32)
    # compare the interior (>=2 px inside both the border and the fill
    # region) — PIL's edge handling near the fill boundary differs
    inner = (slice(4, 28), slice(4, 28))
    diff = np.abs(ours[inner] - ref[inner])
    assert diff.max() <= 1.0, diff.max()   # PIL rounds to uint8; we stay float


def test_bicubic_shear_close_to_bilinear_but_not_identical(img):
    """The two kernels must agree coarsely (same geometry) while differing
    in detail (different interpolation) — guards against the order knob
    silently routing both ways to one kernel."""
    bl = np.asarray(RA.shear_x(_f(img), jnp.float32(0.2), order=1))
    bc = np.asarray(RA.shear_x(_f(img), jnp.float32(0.2), order=3))
    assert np.abs(bl - bc).mean() < 20.0       # same geometry
    assert np.abs(bl - bc).max() > 1.0         # different kernel


@pytest.mark.parametrize("order,resample", [(1, Image.BILINEAR),
                                            (3, Image.BICUBIC)])
def test_rotate_matches_pil(img, order, resample):
    """Full PIL-oracle parity for rotate, both kernels (interior, PIL
    rounds to uint8 so +-1)."""
    for deg in (20.0, -13.0):
        ours = np.asarray(RA.rotate(_f(img), jnp.float32(deg), order=order))
        ref = np.asarray(Image.fromarray(img).rotate(
            deg, resample=resample, fillcolor=(128, 128, 128))
        ).astype(np.float32)
        inner = (slice(6, 26), slice(6, 26))
        assert np.abs(ours[inner] - ref[inner]).max() <= 1.0


@pytest.mark.parametrize("order,resample", [(1, Image.BILINEAR),
                                            (3, Image.BICUBIC)])
def test_shear_matches_pil(img, order, resample):
    """Reference shears are origin-anchored PIL transforms
    (rand_augment.py:70-81) — oracle parity for both axes and kernels."""
    f = 0.2
    ours = np.asarray(RA.shear_x(_f(img), jnp.float32(f), order=order))
    ref = np.asarray(Image.fromarray(img).transform(
        (32, 32), Image.AFFINE, (1, f, 0, 0, 1, 0), resample=resample,
        fillcolor=(128, 128, 128))).astype(np.float32)
    # 1.5: PIL's fixed-point bilinear can land one count below an exact
    # x.9999... float result
    inner = (slice(2, 26), slice(2, 26))
    assert np.abs(ours[inner] - ref[inner]).max() <= 1.5

    ours = np.asarray(RA.shear_y(_f(img), jnp.float32(-f), order=order))
    ref = np.asarray(Image.fromarray(img).transform(
        (32, 32), Image.AFFINE, (1, 0, 0, -f, 1, 0), resample=resample,
        fillcolor=(128, 128, 128))).astype(np.float32)
    inner = (slice(6, 30), slice(6, 30))
    assert np.abs(ours[inner] - ref[inner]).max() <= 1.5
