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
reference uses (util/crop.py:16-42): sample area fraction in [0.08, 1] and
log-uniform aspect in [3/4, 4/3] (10 tries, fall back to center crop); the
resize here is PIL-bicubic-kernel cubic via one ``scale_and_translate``
per image (reference transforms use interpolation=3 = PIL BICUBIC).
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


def _resize_crop(img: jax.Array, top, left, ch, cw, out_size: int) -> jax.Array:
    """Resample the [top:top+ch, left:left+cw] box to out_size^2 with a
    single fused scale_and_translate (no intermediate crop buffer).

    Kernel is "cubic" (Keys a=-0.5 — the PIL BICUBIC kernel): the reference
    transforms pass interpolation=3 = PIL.Image.BICUBIC everywhere
    (image_datasets.py:17,22).  Output is clamped to [0, 255] like PIL's
    per-pass uint8 clip (cubic overshoots on edges).  On the 256->224 eval
    center crop (scale 1, integer offsets) the kernel reduces to an exact
    crop, so eval pixels come straight from the PIL-bicubic canvas.

    Known train-aug border subtlety vs torchvision: RandomResizedCrop crops
    FIRST, so kernel taps at the box edge replicate crop-edge pixels; this
    fused form samples the full canvas, so edge taps read the true
    neighboring pixels instead (a <=2-px band, augmentation-time only —
    dynamic box shapes can't be sliced under jit).

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
    return _resize_crop(img, top, left, ch, cw, out_size)


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
