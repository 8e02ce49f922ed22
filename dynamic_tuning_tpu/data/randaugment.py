"""On-device JAX RandAugment.

The reference vendors a PIL-op RandAugment (video_datasets/rand_augment.py,
537 LoC: shear/translate/rotate/posterize/solarize/color ops, magnitude
mappers, config-string parser) running on CPU workers.  This is the TPU-native
re-expression: every op is a jittable tensor function on uint8 HWC images,
geometric ops go through one affine warp (bilinear by default, or the
EXACT Pillow-transform BICUBIC — a non-normalized 2-tap cubic, see
``_pil_transform_cubic`` — via ``interpolation="bicubic"``, which the
video pipeline passes to match the reference recipe's
interpolation='bicubic', k400.py:133), and per-image
op selection uses ``lax.switch`` — the whole augmentation runs vmapped on
device inside the input pipeline.  timm's own image default
(_RANDOM_INTERPOLATION) mixes bilinear/bicubic per op, so bilinear stays
the image-path default; eval paths use the exact reference kernels (see
data/video.py, data/transforms.py).

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

def _pil_transform_cubic(t: jax.Array) -> jax.Array:
    """Pillow Geometry.c ``bicubic_filter`` weights for the 4 taps at
    offsets {-1, 0, 1, 2} given fractional coordinate ``t`` in [0,1).

    Pillow's ``Image.transform(..., resample=BICUBIC)`` does NOT use the
    a=-0.5 Keys kernel its resize path uses: Geometry.c keeps the classic
    a=-1.0 cubic-convolution kernel.  Pinned empirically (Pillow 12.1)
    by impulse/pair responses: near weights k(0.25)=0.8906, k(0.75)=0.2969
    (= t^3-2t^2+1, the a=-1 near lobe) and far weights k(1.25)=-0.141,
    k(1.75)=-0.047 recovered from two-pixel superposition (negative lobes
    are invisible in a single-impulse probe — they clamp to 0 in uint8).
    Matching the reference's video RandAugment (PIL transform,
    interpolation='bicubic', k400.py:133) means matching THIS kernel."""
    a = -1.0
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t])          # |x| per tap
    near = (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0   # |x| < 1
    far = a * (d ** 3 - 5.0 * d ** 2 + 8.0 * d - 4.0)      # 1 <= |x| < 2
    return jnp.stack([far[0], near[1], near[2], far[3]])


def _affine(img: jax.Array, mat: jax.Array, order: int = 1,
            centered: bool = True) -> jax.Array:
    """Apply inverse affine [2x3] to an HWC uint8/float image, gray fill.

    ``order``: 1 = bilinear (timm's default image recipe mixes kernels, so
    bilinear is representative); 3 = PIL-transform BICUBIC (the exact
    Pillow a=-1 cubic, see ``_pil_transform_cubic``) — the video recipe's
    interpolation='bicubic' (reference k400.py:133).

    ``centered``: True maps about the image center (PIL ``rotate``
    semantics — verified against PIL to ±1); False reproduces PIL
    ``transform(AFFINE)``, which the reference's shear ops use with
    origin-anchored coeffs (rand_augment.py:70-81): PIL samples at
    ``M @ (out + 0.5) + t - 0.5`` (pixel-CENTER convention), which our
    centered form yields exactly with cx = cy = -0.5."""
    h, w = img.shape[0], img.shape[1]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cx, cy = ((w - 1) / 2.0, (h - 1) / 2.0) if centered else (-0.5, -0.5)
    xs = xx - cx
    ys = yy - cy
    src_x = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2] + cx
    src_y = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2] + cy
    inside = ((src_x >= 0) & (src_x <= w - 1) &
              (src_y >= 0) & (src_y <= h - 1))

    if order == 3:
        imgf = img.astype(jnp.float32)
        x0 = jnp.floor(src_x)
        y0 = jnp.floor(src_y)
        wx = _pil_transform_cubic(src_x - x0)           # [4, H, W]
        wy = _pil_transform_cubic(src_y - y0)
        xi = x0.astype(jnp.int32)
        yi = y0.astype(jnp.int32)
        out = jnp.zeros_like(imgf)
        for dy in range(-1, 3):
            row = jnp.clip(yi + dy, 0, h - 1)
            for dx in range(-1, 3):
                col = jnp.clip(xi + dx, 0, w - 1)
                wgt = (wy[dy + 1] * wx[dx + 1])[..., None]
                out = out + wgt * imgf[row, col]
        # PIL clamps the (overshooting a=-1 lobes) result to uint8
        out = jnp.clip(out, 0.0, 255.0)
    else:
        def sample(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch.astype(jnp.float32), [src_y, src_x], order=1,
                mode="nearest")

        out = jnp.stack([sample(img[..., c]) for c in range(img.shape[-1])],
                        -1)
    return jnp.where(inside[..., None], out, FILL)


def shear_x(img, v, order=1):
    # PIL transform coeffs (1, v, 0, 0, 1, 0): src_x = x + v*y about the
    # top-left origin — the reference shears are NOT center-shears
    # (rand_augment.py:70-74)
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[0, 1].set(v),
                   order, centered=False)


def shear_y(img, v, order=1):
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[1, 0].set(v),
                   order, centered=False)


def translate_x(img, v, order=1):
    # v is a pixel offset; inverse map shifts the sampling grid
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[0, 2].set(v),
                   order)


def translate_y(img, v, order=1):
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]).at[1, 2].set(v),
                   order)


def rotate(img, deg, order=1):
    # the inverse (output->input) map of PIL rotate(deg) is the +deg
    # rotation in (x right, y down) coords — pinned against PIL to ±1
    # interior (an earlier revision negated this; the magnitude sign is
    # randomized so the aug DISTRIBUTION was unaffected, but per-op parity
    # was mirrored)
    rad = deg * jnp.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    return _affine(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
                   .at[0, 0].set(c).at[0, 1].set(-s)
                   .at[1, 0].set(s).at[1, 1].set(c), order)


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
               img_size: int, increasing: bool = True) -> jax.Array:
    """timm magnitude mapping per op, both severity families.

    ``increasing=True`` = the *_INCREASING mappings (severity grows with
    level); ``False`` = the original TF-EfficientNet mappings where
    Posterize/Solarize severity DEcreases with level and the enhance ops
    sweep 0.1..1.9 unsigned (rand_augment.py:213-262).  The reference's
    int() truncations are reproduced with floor (level >= 0)."""
    frac = level / _MAX_LEVEL
    if op_name in ("AutoContrast", "Equalize", "Invert"):
        return jnp.float32(0)
    if op_name == "Rotate":
        return _signed(rng, frac * 30.0)
    if op_name == "Posterize":
        # reference: int(frac*4) bits kept (non-inc) / 4 - int(frac*4)
        # (inc, rand_augment.py:248-259) — the int() goes INSIDE: flooring
        # after the subtraction keeps one bit too few at most levels
        bits = jnp.floor(frac * 4.0)
        return 4.0 - bits if increasing else bits
    if op_name == "Solarize":
        thresh = jnp.floor(frac * 256.0)
        return 256.0 - thresh if increasing else thresh
    if op_name == "SolarizeAdd":
        return jnp.floor(frac * 110.0)
    if op_name in ("Color", "Contrast", "Brightness", "Sharpness"):
        if increasing:
            return 1.0 + _signed(rng, frac * 0.9)
        return frac * 1.8 + 0.1
    if op_name in ("ShearX", "ShearY"):
        return _signed(rng, frac * 0.3)
    if op_name in ("TranslateX", "TranslateY"):
        return _signed(rng, frac * 0.45 * img_size)
    raise KeyError(op_name)


def parse_config(config: str) -> Tuple[float, int, float, bool]:
    """'rand-m7-n4-mstd0.5-inc1' -> (magnitude, num_ops, mstd, increasing).

    Matches the reference parser's EXECUTED behavior
    (rand_augment.py:505-533): any 'inc' token — including 'inc0' —
    selects the increasing-severity transforms, because the reference
    tests ``bool(val)`` on the token's STRING value and every non-empty
    string is truthy.  Only a config with no inc token at all gets the
    original mappings.  'w' (op-choice probability weights) is implemented
    by the reference but not here, so it fails loud instead of silently
    changing the op distribution."""
    m, n, mstd, inc = 10.0, 2, 0.0, False
    for tok in config.split("-")[1:]:
        if tok.startswith("mstd"):
            mstd = float(tok[4:])
        elif tok.startswith("inc"):
            inc = True
        elif tok.startswith("w"):
            raise NotImplementedError(
                f"rand-augment op-choice weights ('{tok}') not supported")
        elif tok.startswith("m"):
            m = float(re.sub("[^0-9.]", "", tok))
        elif tok.startswith("n"):
            n = int(re.sub("[^0-9]", "", tok))
    return m, n, mstd, inc


_GEOMETRIC = {"Rotate", "ShearX", "ShearY", "TranslateX", "TranslateY"}


def rand_augment(rng: jax.Array, img: jax.Array, *, magnitude: float = 9.0,
                 num_ops: int = 2, mstd: float = 0.5,
                 interpolation: str = "bilinear", prob: float = 0.5,
                 increasing: bool = True) -> jax.Array:
    """Select ``num_ops`` random ops; apply each with probability ``prob``.

    The reference builds every AugmentOp with prob=0.5
    (rand_augment.py:463) and skips the op when random() > prob (:371), so
    'n4' applies ~2 ops in expectation — applying every selected op would
    double the augmentation intensity.

    ``interpolation``: warp kernel for the geometric ops — "bilinear"
    (image default; timm mixes kernels) or "bicubic" (the video recipe's
    PIL BICUBIC, reference k400.py:133)."""
    img = img.astype(jnp.float32)
    size = img.shape[1]
    order = 3 if interpolation == "bicubic" else 1

    def apply_one(i, carry):
        im, r = carry
        r, r_op, r_mag, r_sign, r_prob = jax.random.split(r, 5)
        op_idx = jax.random.randint(r_op, (), 0, len(OPS))
        level = magnitude + mstd * jax.random.normal(r_mag)
        level = jnp.clip(level, 0.0, _MAX_LEVEL)

        branches = []
        for name, fn in OPS:
            v = _magnitude(name, level, r_sign, size, increasing)
            if name in _GEOMETRIC:
                branches.append(
                    partial(lambda f, vv, x: f(x, vv, order), fn, v))
            else:
                branches.append(partial(lambda f, vv, x: f(x, vv), fn, v))
        aug = jax.lax.cond(
            jax.random.uniform(r_prob) <= prob,
            lambda x: jax.lax.switch(op_idx, branches, x),
            lambda x: x, im)
        return aug, r

    out, _ = jax.lax.fori_loop(0, num_ops, apply_one, (img, rng))
    return jnp.clip(out, 0, 255)


def rand_augment_batch(rng: jax.Array, imgs: jax.Array,
                       config: str = "rand-m9-n2-mstd0.5-inc1",
                       interpolation: str = "bilinear") -> jax.Array:
    """[B,H,W,3] uint8 -> augmented uint8 (vmapped per image)."""
    m, n, mstd, inc = parse_config(config)
    rngs = jax.random.split(rng, imgs.shape[0])
    fn = partial(rand_augment, magnitude=m, num_ops=n, mstd=mstd,
                 interpolation=interpolation, increasing=inc)
    out = jax.vmap(fn)(rngs, imgs)
    return out.astype(jnp.uint8)


def random_erasing(rng: jax.Array, img: jax.Array, *, prob: float = 0.25,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 10 / 3),
                   per_pixel: bool = True) -> jax.Array:
    """RandomErasing (reference video_datasets/random_erasing.py:91-117):
    up to 10 (area, aspect) draws, the first whose box fits STRICTLY
    inside the image wins (h < img_h and w < img_w); its position is then
    integer-uniform over [0, img_dim - box] INCLUSIVE, so the sampled area
    is always fully erased — boxes never clip at borders.  Erase fill is
    per-pixel gaussian noise; normalized-space input (applied after
    normalization, as in timm)."""
    h, w = img.shape[0], img.shape[1]
    k_loop, k_noise, k_prob = jax.random.split(rng, 3)

    def try_one(i, carry):
        found, eh, ew, top, left, key = carry
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        area = h * w * jax.random.uniform(k1, minval=area_range[0],
                                          maxval=area_range[1])
        log_ar = jax.random.uniform(k2, minval=jnp.log(aspect_range[0]),
                                    maxval=jnp.log(aspect_range[1]))
        ar = jnp.exp(log_ar)
        neh = jnp.round(jnp.sqrt(area * ar)).astype(jnp.int32)
        new = jnp.round(jnp.sqrt(area / ar)).astype(jnp.int32)
        fits = (neh < h) & (new < w)
        # random.randint(0, n) is INCLUSIVE of n -> floor(u * (n + 1))
        ntop = jnp.floor(jax.random.uniform(k3)
                         * (h - neh + 1).astype(jnp.float32)).astype(jnp.int32)
        nleft = jnp.floor(jax.random.uniform(k4)
                          * (w - new + 1).astype(jnp.float32)).astype(jnp.int32)
        take = fits & ~found
        return (found | fits,
                jnp.where(take, neh, eh), jnp.where(take, new, ew),
                jnp.where(take, ntop, top), jnp.where(take, nleft, left),
                key)

    found, eh, ew, top, left, _ = jax.lax.fori_loop(
        0, 10, try_one,
        (jnp.bool_(False), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), k_loop))
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    box = ((yy >= top) & (yy < top + eh) & (xx >= left) & (xx < left + ew)
           & found)
    noise = (jax.random.normal(k_noise, img.shape, img.dtype)
             if per_pixel else 0.0)
    erased = jnp.where(box[..., None], noise, img)
    return jnp.where(jax.random.bernoulli(k_prob, prob), erased, img)
