"""Train-aug crop+resize parity against PIL itself.

The reference's RandomResizedCrop (util/crop.py:16-45, subclassing the
torchvision transform) ends in ``F.resized_crop`` -> PIL ``crop((l, t,
l+w, t+h)).resize((224, 224), BICUBIC)``.  Crop-FIRST semantics: PIL's
resampler (src/libImaging/Resample.c) drops kernel taps outside the
cropped image and renormalizes the remaining weights, so crop borders do
NOT read neighboring canvas pixels.  ``_pil_resized_crop`` reproduces
this under jit (separable matrices + per-pass uint8 rounding); PIL's
8-bit fixed-point coefficients leave a ±1 residue, which is the pinned
tolerance (the same standard as the native canvas resampler).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dynamic_tuning_tpu.data import transforms as T


def _pil_oracle(canvas: np.ndarray, top: int, left: int, ch: int, cw: int,
                out: int) -> np.ndarray:
    img = Image.fromarray(canvas)
    box = img.crop((left, top, left + cw, top + ch))
    return np.asarray(box.resize((out, out), Image.BICUBIC), dtype=np.float32)


def _ours(canvas: np.ndarray, top, left, ch, cw, out: int) -> np.ndarray:
    fn = jax.jit(T._pil_resized_crop, static_argnames=("out_size",))
    res = fn(jnp.asarray(canvas), float(top), float(left), float(ch),
             float(cw), out_size=out)
    return np.asarray(res)


@pytest.mark.parametrize("case", [
    # (H, top, left, ch, cw, out): upscale, downscale, border-touching, tiny
    (64, 0, 0, 64, 64, 48),          # full canvas, downscale
    (64, 0, 0, 64, 64, 96),          # full canvas, upscale
    (64, 0, 0, 12, 20, 48),          # top-left corner box (border renorm)
    (64, 52, 44, 12, 20, 48),        # bottom-right corner box
    (64, 10, 30, 9, 34, 48),         # interior asymmetric box
    (96, 1, 95 - 8, 95, 8, 32),      # 1-px from edges, extreme aspect
])
def test_matches_pil_crop_resize(case):
    H, top, left, ch, cw, out = case
    rng = np.random.default_rng(hash(case) % (2 ** 31))
    canvas = rng.integers(0, 256, (H, H, 3), dtype=np.uint8)
    ref = _pil_oracle(canvas, top, left, ch, cw, out)
    got = _ours(canvas, top, left, ch, cw, out)
    assert np.abs(ref - got).max() <= 1.0 + 1e-5


def test_random_boxes_match_pil():
    """±1 except a ~1e-7 fraction of pixels at ±2: PIL rounds each pass in
    22-bit fixed point; emulating that in f32 can flip a .5-boundary
    intermediate by one count, which the second pass can amplify to 2."""
    rng = np.random.default_rng(7)
    worst = 0.0
    n_gt1 = 0
    total = 0
    for _ in range(12):
        H = int(rng.integers(40, 120))
        canvas = rng.integers(0, 256, (H, H, 3), dtype=np.uint8)
        ch = int(rng.integers(8, H + 1))
        cw = int(rng.integers(8, H + 1))
        top = int(rng.integers(0, H - ch + 1))
        left = int(rng.integers(0, H - cw + 1))
        out = int(rng.integers(16, 80))
        ref = _pil_oracle(canvas, top, left, ch, cw, out)
        got = _ours(canvas, top, left, ch, cw, out)
        d = np.abs(ref - got)
        worst = max(worst, float(d.max()))
        n_gt1 += int((d > 1).sum())
        total += d.size
    assert worst <= 2.0
    assert n_gt1 <= max(1, int(2e-5 * total))


def test_sampled_box_end_to_end():
    """random_resized_crop's own sampled box, replayed through PIL."""
    H, out = 72, 56
    np_rng = np.random.default_rng(3)
    canvas = np_rng.integers(0, 256, (H, H, 3), dtype=np.uint8)
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        top, left, ch, cw = (int(v) for v in jax.device_get(
            T._sample_crop_box(key, H, H)))
        got = np.asarray(T.random_resized_crop(key, jnp.asarray(canvas), out))
        ref = _pil_oracle(canvas, top, left, ch, cw, out)
        assert np.abs(ref - got).max() <= 1.0 + 1e-5


def test_scale_one_integer_box_is_exact_crop():
    """PIL path keeps the scale-1 exact-crop property (weights collapse to
    deltas, rounding is identity on integers)."""
    rng = np.random.default_rng(11)
    canvas = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    got = _ours(canvas, 5, 7, 24, 24, 24)
    np.testing.assert_array_equal(got, canvas[5:29, 7:31].astype(np.float32))
