"""On-device JAX RandAugment.

The reference vendors a PIL-op RandAugment (video_datasets/rand_augment.py,
537 LoC: shear/translate/rotate/posterize/solarize/color ops, magnitude
mappers, config-string parser) running on CPU workers.  This is the TPU-native
re-expression: every op is a jittable tensor function on uint8 HWC images,
geometric ops go through one bilinear ``map_coordinates`` warp, and per-image
op selection uses ``lax.switch`` — the whole augmentation runs vmapped on
device inside the input pipeline.

Known approximation: the reference warps with PIL BICUBIC when the video
recipe passes interpolation='bicubic' (k400.py:133); jax map_coordinates
caps at order=1 (bilinear).  Augmentation-time only — timm's own default
(_RANDOM_INTERPOLATION) already mixes bilinear/bicubic per op, so the aug
distribution is not kernel-pinned even in torch-land; eval paths use the
exact reference kernels (see data/video.py, data/transforms.py).

Config strings follow the same grammar: ``rand-m7-n4-mstd0.5-inc1``
(magnitude 7, 4 ops/image, magnitude jitter std 0.5; inc selects the
increasing-severity schedules).  Default fill is mid-gray (128), matching the
reference's ``fillcolor``.
"""

from __future__ import annotations

import re
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

_MAX_LEVEL = 10.0
FILL = 128.0


# --- geometric ops (single affine warp) -------------------------------------

def _affine(img: jax.Array, mat: jax.Array) -> jax.Array:
    """Apply inverse affine [2x3] to an HWC uint8/float image, bilinear,
    gray fill."""
    h, w = img.shape[0], img.shape[1]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # centered coords (PIL rotates/shears about the center)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xs = xx - cx
    ys = yy - cy
    src_x = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2] + cx
    src_y = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2] + cy
    inside = ((src_x >= 0) & (src_x <= w - 1) &
              (src_y >= 0) & (src_y <= h - 1))

    def sample(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch.astype(jnp.float32), [src_y, src_x], order=1, mode="nearest")

    out = jnp.stack([sample(img[..., c]) for c in range(img.shape[-1])], -1)
    return jnp.where(inside[..., None], out, FILL)


def shear_x(img, v):
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[0, 1].set(v))


def shear_y(img, v):
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[1, 0].set(v))


def translate_x(img, v):
    # v is a pixel offset; inverse map shifts the sampling grid
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[0, 2].set(v))


def translate_y(img, v):
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[1, 2].set(v))


def rotate(img, deg):
    rad = -deg * jnp.pi / 180.0      # inverse rotation
    c, s = jnp.cos(rad), jnp.sin(rad)
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
                   .at[0, 0].set(c).at[0, 1].set(-s)
                   .at[1, 0].set(s).at[1, 1].set(c))


# --- photometric ops ----------------------------------------------------------

def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def _gray(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def auto_contrast(img, _v):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    return jnp.where(hi > lo, (img - lo) * scale, img)


def equalize(img, _v):
    """Per-channel PIL-style histogram equalization."""

    def eq_channel(ch):
        flat = ch.reshape(-1).astype(jnp.int32)
        hist = jnp.bincount(flat, length=256)
        nonzero = hist > 0
        # PIL: step = (total - last_nonzero_count) // 255
        last_nz = 255 - jnp.argmax(nonzero[::-1])
        step = (hist.sum() - hist[last_nz]) // 255
        cum = jnp.cumsum(hist)
        lut = jnp.clip(((cum - hist) + step // 2) // jnp.maximum(step, 1),
                       0, 255)
        return jnp.where(step == 0, ch, lut[flat].reshape(ch.shape)
                         .astype(ch.dtype))

    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], -1)


def invert(img, _v):
    return 255.0 - img


def posterize(img, bits):
    bits = jnp.clip(bits.astype(jnp.int32), 0, 8)
    shift = 8 - bits
    vals = img.astype(jnp.int32)
    return jnp.where(bits >= 8, img,
                     ((vals >> shift) << shift).astype(jnp.float32))


def solarize(img, thresh):
    return jnp.where(img >= thresh, 255.0 - img, img)


def solarize_add(img, add):
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def color(img, factor):
    return _blend(img, _gray(img)[..., None], factor)


def contrast(img, factor):
    mean = _gray(img).mean()
    return _blend(img, mean, factor)


def brightness(img, factor):
    return _blend(img, 0.0, factor)


def sharpness(img, factor):
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], kernel[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0].transpose(1, 2, 0)
    # PIL keeps the border unsmoothed
    smoothed = smoothed.at[0].set(img[0]).at[-1].set(img[-1])
    smoothed = smoothed.at[:, 0].set(img[:, 0]).at[:, -1].set(img[:, -1])
    return _blend(img, smoothed, factor)


# --- magnitude schedules (timm _inc1 variants) --------------------------------

def _signed(rng, v):
    return jnp.where(jax.random.bernoulli(rng), v, -v)


OPS: List[Tuple[str, callable]] = [
    ("AutoContrast", auto_contrast),
    ("Equalize", equalize),
    ("Invert", invert),
    ("Rotate", rotate),
    ("Posterize", posterize),
    ("Solarize", solarize),
    ("SolarizeAdd", solarize_add),
    ("Color", color),
    ("Contrast", contrast),
    ("Brightness", brightness),
    ("Sharpness", sharpness),
    ("ShearX", shear_x),
    ("ShearY", shear_y),
    ("TranslateX", translate_x),
    ("TranslateY", translate_y),
]


def _magnitude(op_name: str, level: jax.Array, rng: jax.Array,
               img_size: int) -> jax.Array:
    """timm increasing-severity magnitude mapping per op."""
    frac = level / _MAX_LEVEL
    if op_name in ("AutoContrast", "Equalize", "Invert"):
        return jnp.float32(0)
    if op_name == "Rotate":
        return _signed(rng, frac * 30.0)
    if op_name == "Posterize":
        return 4.0 - frac * 4.0          # bits removed increases with level
    if op_name == "Solarize":
        return 256.0 - frac * 256.0
    if op_name == "SolarizeAdd":
        return frac * 110.0
    if op_name in ("Color", "Contrast", "Brightness", "Sharpness"):
        return 1.0 + _signed(rng, frac * 0.9)
    if op_name in ("ShearX", "ShearY"):
        return _signed(rng, frac * 0.3)
    if op_name in ("TranslateX", "TranslateY"):
        return _signed(rng, frac * 0.45 * img_size)
    raise KeyError(op_name)


def parse_config(config: str) -> Tuple[float, int, float]:
    """'rand-m7-n4-mstd0.5-inc1' -> (magnitude, num_ops, mstd)."""
    m, n, mstd = 10.0, 2, 0.0
    for tok in config.split("-")[1:]:
        if tok.startswith("mstd"):
            mstd = float(tok[4:])
        elif tok.startswith("m"):
            m = float(re.sub("[^0-9.]", "", tok))
        elif tok.startswith("n"):
            n = int(re.sub("[^0-9]", "", tok))
    return m, n, mstd


def rand_augment(rng: jax.Array, img: jax.Array, *, magnitude: float = 9.0,
                 num_ops: int = 2, mstd: float = 0.5) -> jax.Array:
    """Apply ``num_ops`` randomly-chosen ops to one HWC uint8 image."""
    img = img.astype(jnp.float32)
    size = img.shape[1]

    def apply_one(i, carry):
        im, r = carry
        r, r_op, r_mag, r_sign = jax.random.split(r, 4)
        op_idx = jax.random.randint(r_op, (), 0, len(OPS))
        level = magnitude + mstd * jax.random.normal(r_mag)
        level = jnp.clip(level, 0.0, _MAX_LEVEL)

        branches = []
        for name, fn in OPS:
            v = _magnitude(name, level, r_sign, size)
            branches.append(partial(lambda f, vv, x: f(x, vv), fn, v))
        im = jax.lax.switch(op_idx, branches, im)
        return im, r

    out, _ = jax.lax.fori_loop(0, num_ops, apply_one, (img, rng))
    return jnp.clip(out, 0, 255)


def rand_augment_batch(rng: jax.Array, imgs: jax.Array,
                       config: str = "rand-m9-n2-mstd0.5-inc1") -> jax.Array:
    """[B,H,W,3] uint8 -> augmented uint8 (vmapped per image)."""
    m, n, mstd = parse_config(config)
    rngs = jax.random.split(rng, imgs.shape[0])
    fn = partial(rand_augment, magnitude=m, num_ops=n, mstd=mstd)
    out = jax.vmap(fn)(rngs, imgs)
    return out.astype(jnp.uint8)


def random_erasing(rng: jax.Array, img: jax.Array, *, prob: float = 0.25,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 10 / 3),
                   per_pixel: bool = True) -> jax.Array:
    """RandomErasing (reference video_datasets/random_erasing.py:38):
    erase a random rectangle with per-pixel gaussian noise.  Normalized-space
    input (applied after normalization, as in timm)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    area = h * w * jax.random.uniform(k1, minval=area_range[0],
                                      maxval=area_range[1])
    log_ar = jax.random.uniform(k2, minval=jnp.log(aspect_range[0]),
                                maxval=jnp.log(aspect_range[1]))
    ar = jnp.exp(log_ar)
    eh = jnp.clip(jnp.sqrt(area * ar), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / ar), 1, w).astype(jnp.int32)
    top = jax.random.randint(k3, (), 0, h)
    left = jax.random.randint(k4, (), 0, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= top) & (yy < top + eh) & (xx >= left) & (xx < left + ew))
    noise = jax.random.normal(k5, img.shape, img.dtype) if per_pixel else 0.0
    erased = jnp.where(box[..., None], noise, img)
    return jnp.where(jax.random.bernoulli(k6, prob), erased, img)
