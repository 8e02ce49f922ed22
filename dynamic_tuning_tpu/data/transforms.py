"""On-device JAX image augmentation.

The reference runs all augmentation on CPU dataloader workers with
PIL/torchvision (datasets/image_datasets.py:16-25: TPU-paper-style
RandomResizedCrop(224) + horizontal flip + normalize; eval: Resize 256 +
CenterCrop 224; VTAB no-aug: Resize((224,224)) both splits,
image_datasets_noaug.py:16-23).

TPU-native: the host only decodes to fixed-size uint8 canvases; every
augmentation (crop sampling, resize, flip, normalize) runs vmapped inside the
training jit on device — zero CPU aug bottleneck, and the RNG is a JAX key so
runs are exactly reproducible regardless of host thread scheduling.

RandomResizedCrop sampling follows the torchvision/TPU-paper algorithm the
reference uses (util/crop.py:16-42): one (area, aspect) draw, clamped dims,
integer-uniform position; the train resample is PIL-exact crop-then-resize
(two separable matmul passes with PIL's tap-drop border renormalization and
per-pass uint8 rounding — ±1 vs PIL's fixed-point, pinned in
tests/test_transforms_pil_parity.py); eval keeps full-canvas
``scale_and_translate`` because Resize-then-CenterCrop reads beyond the
crop window (reference transforms use interpolation=3 = PIL BICUBIC).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


def normalize(x: jax.Array, inception: bool = False) -> jax.Array:
    """uint8 [0,255] -> normalized float32."""
    mean = jnp.asarray(INCEPTION_MEAN if inception else IMAGENET_MEAN)
    std = jnp.asarray(INCEPTION_STD if inception else IMAGENET_STD)
    x = x.astype(jnp.float32) / 255.0
    return (x - mean) / std


def _sample_crop_box(rng: jax.Array, h: int, w: int,
                     scale: Tuple[float, float] = (0.08, 1.0),
                     ratio: Tuple[float, float] = (3 / 4, 4 / 3)):
    """Sample (top, left, crop_h, crop_w), reference-exact.

    The reference's RandomResizedCrop is the BYOL/TPU SINGLE-DRAW variant
    (util/crop.py:16-45, the class image_datasets.py:17 actually imports —
    'no for-loop is used'), NOT torchvision's 10-try loop: one
    (area, aspect) draw, crop dims rounded then CLAMPED to the image,
    integer-uniform position.  High-area draws on square images therefore
    keep their (clamped) size instead of being rerolled smaller."""
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    area = h * w
    target = area * jax.random.uniform(k_area, minval=scale[0],
                                       maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(k_ratio, minval=jnp.log(ratio[0]),
                                        maxval=jnp.log(ratio[1])))
    cw = jnp.minimum(jnp.round(jnp.sqrt(target * aspect)), w)
    ch = jnp.minimum(jnp.round(jnp.sqrt(target / aspect)), h)
    # torch.randint(0, h - ch + 1): integer-uniform inclusive position
    top = jnp.floor(jax.random.uniform(k_top) * (h - ch + 1))
    left = jnp.floor(jax.random.uniform(k_left) * (w - cw + 1))
    return top, left, ch, cw


def _pil_bicubic_kernel(x: jax.Array) -> jax.Array:
    """PIL's BICUBIC resize kernel (Keys cubic, a=-0.5)."""
    a = -0.5
    ax = jnp.abs(x)
    near = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    far = (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a
    return jnp.where(ax < 1.0, near, jnp.where(ax < 2.0, far, 0.0))


def _pil_max_taps(in_size: int, out_size: int) -> int:
    """Static tap-window size for a crop box as large as ``in_size``:
    2*ceil(support)+3 with support = 2*max(box/out, 1) — wide enough to
    cover the kernel's full support plus ±1 of window-placement jitter."""
    import math
    support = 2.0 * max(in_size / out_size, 1.0)
    return int(math.ceil(support)) * 2 + 3


def _pil_resample_matrix(origin, size, out_size: int, full: int) -> jax.Array:
    """[out_size, full] separable resample matrix reproducing PIL's
    ``crop((origin, origin+size)).resize(out_size, BICUBIC)`` along one axis.

    PIL (src/libImaging/Resample.c precompute_coeffs) drops kernel taps that
    fall outside the cropped image and RENORMALIZES the remaining weights —
    crop-first semantics, unlike resize-then-crop which reads neighbors.
    ``origin``/``size`` are traced integer-valued floats, so this builds the
    matrix with static shapes: a bounded tap window + one-hot scatter into
    canvas columns (dynamic box shapes can't be sliced under jit).

    PIL windows taps by ``int(center ± support + 0.5)``, but taps at the
    window boundary always carry zero kernel weight, so a WIDER integer
    window masked by (a) kernel support and (b) the exact-integer crop
    bounds [0, size) is mathematically identical — and, unlike the boundary
    expression, has no float-threshold sensitivity (XLA duplicates
    subexpressions across fusions with different FMA contractions, so the
    same ``floor(center - support + 0.5)`` can evaluate to different values
    in the tap chain vs the weight chain when it lands on an integer)."""
    max_taps = _pil_max_taps(full, out_size)
    scale = size / out_size
    fs = jnp.maximum(scale, 1.0)          # filterscale: kernel widens when
    support = 2.0 * fs                    # minifying (PIL antialias)
    ss = 1.0 / fs
    xx = jnp.arange(out_size, dtype=jnp.float32)
    center = (xx + 0.5) * scale           # crop-local coordinates
    base = jnp.floor(center) - (max_taps // 2)
    taps = base[:, None] + jnp.arange(max_taps, dtype=jnp.float32)[None, :]
    w = _pil_bicubic_kernel((taps - center[:, None] + 0.5) * ss)
    w = jnp.where((taps >= 0.0) & (taps < size), w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    idx = (origin + taps).astype(jnp.int32)   # canvas columns
    onehot = (idx[:, :, None] == jnp.arange(full)[None, None, :])
    return jnp.sum(w[:, :, None] * onehot, axis=1)


def _pil_resized_crop(img: jax.Array, top, left, ch, cw,
                      out_size: int) -> jax.Array:
    """PIL-exact (±1, fixed-point residue) crop-then-resize: the reference's
    RandomResizedCrop calls ``F.resized_crop`` -> PIL ``crop().resize(...,
    BICUBIC)`` (util/crop.py:16-45 + torchvision base class).  Horizontal
    pass, per-pass uint8 round/clip (PIL's 8bpc two-pass pipeline), then
    vertical — `tests/test_transforms_pil_parity.py` pins both passes and
    the border renormalization against PIL itself."""
    ay = _pil_resample_matrix(top, ch, out_size, img.shape[0])
    ax = _pil_resample_matrix(left, cw, out_size, img.shape[1])
    f = img.astype(jnp.float32)
    # PIL's fixed-point accumulators round HALF-UP ((ss + half) >> bits),
    # so use floor(x+0.5), not jnp.round (half-even) — the mismatch shows
    # up as 2-count errors when a pass lands exactly on a .5 boundary.
    tmp = jnp.einsum("hwc,ow->hoc", f, ax)
    tmp = jnp.clip(jnp.floor(tmp + 0.5), 0.0, 255.0)
    out = jnp.einsum("hoc,ph->poc", tmp, ay)
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)


def _resize_crop(img: jax.Array, top, left, ch, cw, out_size: int) -> jax.Array:
    """Resample the [top:top+ch, left:left+cw] box to out_size^2 with a
    single fused scale_and_translate (no intermediate crop buffer).

    Kernel is "cubic" (Keys a=-0.5 — the PIL BICUBIC kernel): the reference
    transforms pass interpolation=3 = PIL.Image.BICUBIC everywhere
    (image_datasets.py:17,22).  Output is clamped to [0, 255] like PIL's
    per-pass uint8 clip (cubic overshoots on edges).  On the 256->224 eval
    center crop (scale 1, integer offsets) the kernel reduces to an exact
    crop, so eval pixels come straight from the PIL-bicubic canvas.

    Used by the EVAL path only: Resize-then-CenterCrop means kernel taps
    legitimately read the full canvas beyond the crop window, which is
    exactly what full-canvas sampling does.  The train path uses
    ``_pil_resized_crop`` (crop-FIRST semantics, PIL-exact borders).

    Known train-aug coverage difference: the reference crops the ORIGINAL
    image, while this two-step pipeline crops the square decode canvas —
    boxes never reach beyond the central square of a non-square source.
    Fixed-size canvases are what make the whole augmentation one static
    vmapped program; --canvas raises detail but not spatial coverage."""
    scale_y = out_size / ch
    scale_x = out_size / cw
    # translation maps input coord `top` to output 0: out = in*scale + t
    t_y = -top * scale_y
    t_x = -left * scale_x
    out = jax.image.scale_and_translate(
        img.astype(jnp.float32), (out_size, out_size, img.shape[-1]),
        (0, 1), jnp.stack([scale_y, scale_x]), jnp.stack([t_y, t_x]),
        method="cubic")
    return jnp.clip(out, 0.0, 255.0)


def random_resized_crop(rng: jax.Array, img: jax.Array, out_size: int = 224,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    top, left, ch, cw = _sample_crop_box(rng, h, w, scale, ratio)
    return _pil_resized_crop(img, top, left, ch, cw, out_size)


def center_crop_resize(img: jax.Array, resize_to: int = 256,
                       crop: int = 224) -> jax.Array:
    """Eval transform: resize shorter side then center crop (reference
    image_datasets.py:22-24)."""
    h, w = img.shape[0], img.shape[1]
    short = min(h, w)
    scale = resize_to / short
    nh, nw = h * scale, w * scale
    top = (nh - crop) / 2.0
    left = (nw - crop) / 2.0
    return _resize_crop(img, top / scale, left / scale, crop / scale,
                        crop / scale, crop)


def hflip(rng: jax.Array, img: jax.Array) -> jax.Array:
    return jnp.where(jax.random.bernoulli(rng), img[:, ::-1, :], img)


@partial(jax.jit, static_argnames=("out_size", "inception", "train"))
def augment_batch(rng: jax.Array, images: jax.Array, *, out_size: int = 224,
                  inception: bool = False, train: bool = True) -> jax.Array:
    """[B, H, W, C] uint8 canvases -> [B, out, out, C] normalized float32.

    Train: per-image RandomResizedCrop + flip + normalize.
    Eval: resize-256/center-crop-224 + normalize.
    """
    if train:
        def one(r, img):
            r1, r2 = jax.random.split(r)
            out = random_resized_crop(r1, img, out_size)
            return hflip(r2, out)

        rngs = jax.random.split(rng, images.shape[0])
        out = jax.vmap(one)(rngs, images)
    else:
        out = jax.vmap(lambda im: center_crop_resize(
            im, resize_to=int(out_size * 256 / 224), crop=out_size))(images)
    return normalize(out, inception)


@partial(jax.jit, static_argnames=("inception",))
def normalize_batch(images: jax.Array, inception: bool = False) -> jax.Array:
    """VTAB no-aug path: canvases are already (224,224); just normalize
    (reference image_datasets_noaug.py:16-23)."""
    return normalize(images, inception)
