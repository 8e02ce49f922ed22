"""On-device JAX video-clip augmentation.

The reference's clip transforms run on CPU tensors (video_datasets/transform.py):
``random_short_side_scale_jitter`` (:49), ``random_crop`` (:125), horizontal
flip (:161), ``uniform_crop`` for eval spatial views (:196).  Here the host
only ships fixed-size uint8 clip canvases; the jitter/crop/flip math runs
vmapped on device with one crop shared across a clip's frames (temporal
consistency, as in the reference).

Resample kernel: the reference resizes with torch bicubic
(k400.py interpolation='bicubic', no clamp — it resizes normalized
floats); we use jax's "cubic" (Keys a=-0.5; torch's A is -0.75 — the two
cubic kernels differ by well under a gray level on natural video) and
likewise do not clamp, since weights sum to 1 and the resize commutes
with the affine normalization exactly as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.data.transforms import normalize


def clip_scale_jitter_crop(rng: jax.Array, clip: jax.Array, *,
                           min_size: int, max_size: int, crop: int) -> jax.Array:
    """Random short-side scale in [min_size, max_size] then random crop^2,
    one draw per clip.  clip: [T, H, W, C] -> [T, crop, crop, C] float32."""
    k_scale, k_top, k_left = jax.random.split(rng, 3)
    T, H, W, C = clip.shape
    short = min(H, W)
    size = jax.random.uniform(k_scale, minval=float(min_size),
                              maxval=float(max_size))
    scale = size / short
    nh, nw = H * scale, W * scale
    top = jax.random.uniform(k_top) * jnp.maximum(nh - crop, 0.0)
    left = jax.random.uniform(k_left) * jnp.maximum(nw - crop, 0.0)
    # map output pixel grid back to input coords: fused scale+translate
    t_y = -top
    t_x = -left
    return jax.image.scale_and_translate(
        clip.astype(jnp.float32), (T, crop, crop, C), (1, 2),
        jnp.stack([scale, scale]), jnp.stack([t_y, t_x]), method="cubic")


def clip_uniform_crop(clip: jax.Array, *, resize_to: int, crop: int,
                      spatial_idx: int, num_crops: int = 3) -> jax.Array:
    """Eval spatial crop: resize short side then take left/center/right (or
    top/center/bottom) crop (reference transform.py:196-240)."""
    T, H, W, C = clip.shape
    short = min(H, W)
    scale = resize_to / short
    nh, nw = H * scale, W * scale

    def offsets():
        if num_crops == 1:
            return (nh - crop) / 2.0, (nw - crop) / 2.0
        # wider side gets the 3 positions
        frac = {0: 0.0, 1: 0.5, 2: 1.0}[spatial_idx]
        if W >= H:
            return (nh - crop) / 2.0, frac * (nw - crop)
        return frac * (nh - crop), (nw - crop) / 2.0

    top, left = offsets()
    return jax.image.scale_and_translate(
        clip.astype(jnp.float32), (T, crop, crop, C), (1, 2),
        jnp.stack([jnp.float32(scale), jnp.float32(scale)]),
        jnp.stack([jnp.float32(-top), jnp.float32(-left)]), method="cubic")


def clip_hflip(rng: jax.Array, clip: jax.Array) -> jax.Array:
    return jnp.where(jax.random.bernoulli(rng), clip[:, :, ::-1, :], clip)


def _sample_crop_box_10try(rng: jax.Array, h: int, w: int, scale, ratio):
    """torchvision-style 10-candidate crop sampler — the VIDEO reference's
    _get_param_spatial_crop (transform.py:504-540): integer-rounded dims,
    first valid candidate wins, inclusive randint positions; fallback is
    the ratio-clamped CENTER crop.  (The IMAGE pipeline uses the BYOL
    single-draw variant instead — transforms._sample_crop_box.)"""
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    n = 10
    area = h * w
    target = area * jax.random.uniform(k_area, (n,), minval=scale[0],
                                       maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(k_ratio, (n,),
                                        minval=jnp.log(ratio[0]),
                                        maxval=jnp.log(ratio[1])))
    cw = jnp.round(jnp.sqrt(target * aspect))
    ch = jnp.round(jnp.sqrt(target / aspect))
    valid = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    first = jnp.argmax(valid)
    ok = valid.any()
    # static fallback (ratio-clamped center crop, transform.py:530-540)
    in_ratio = w / h
    if in_ratio < min(ratio):
        fw, fh = w, int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        fh, fw = h, int(round(h * max(ratio)))
    else:
        fw, fh = w, h
    cw = jnp.where(ok, cw[first], float(fw))
    ch = jnp.where(ok, ch[first], float(fh))
    top = jnp.where(ok, jnp.floor(jax.random.uniform(k_top) * (h - ch + 1)),
                    float((h - fh) // 2))
    left = jnp.where(ok, jnp.floor(jax.random.uniform(k_left) * (w - cw + 1)),
                     float((w - fw) // 2))
    return top, left, ch, cw


def clip_random_resized_crop(rng: jax.Array, clip: jax.Array, *, crop: int,
                             scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)
                             ) -> jax.Array:
    """Inception-style RandomResizedCrop, ONE box for the whole clip
    (reference transform.py:546-585 — the default train resize type of both
    K400 and SSv2, k400.py:42/sthv2_dataset.py:42).  [T,H,W,C] ->
    [T,crop,crop,C] float32."""
    T, H, W, C = clip.shape
    top, left, ch, cw = _sample_crop_box_10try(rng, H, W, scale, ratio)
    scale_y, scale_x = crop / ch, crop / cw
    return jax.image.scale_and_translate(
        clip.astype(jnp.float32), (T, crop, crop, C), (1, 2),
        jnp.stack([scale_y, scale_x]),
        jnp.stack([-top * scale_y, -left * scale_x]), method="cubic")


# --- photometric clip transforms (reference transform.py:281-460) -------------


def _grayscale(clip: jax.Array) -> jax.Array:
    """Rec.601 luma broadcast over channels.  The reference comments its
    input as BGR and indexes accordingly (transform.py:300-318); our pipeline
    is RGB end to end, so the weights attach to the true R/G/B channels."""
    gray = (0.299 * clip[..., 0] + 0.587 * clip[..., 1] + 0.114 * clip[..., 2])
    return jnp.broadcast_to(gray[..., None], clip.shape)


def clip_color_jitter(rng: jax.Array, clip: jax.Array, *,
                      brightness: float = 0.0, contrast: float = 0.0,
                      saturation: float = 0.0) -> jax.Array:
    """brightness/contrast/saturation jitter in a random order, one draw per
    clip (reference color_jitter, transform.py:321-352).  Expects float
    pixels; returns float32."""
    x = clip.astype(jnp.float32)
    k_perm, k_b, k_c, k_s = jax.random.split(rng, 4)
    alphas = {
        "b": 1.0 + jax.random.uniform(k_b, minval=-brightness, maxval=brightness),
        "c": 1.0 + jax.random.uniform(k_c, minval=-contrast, maxval=contrast),
        "s": 1.0 + jax.random.uniform(k_s, minval=-saturation, maxval=saturation),
    }

    def apply_b(x):
        return x * alphas["b"] if brightness else x       # blend with zeros

    def apply_c(x):
        if not contrast:
            return x
        ref = jnp.mean(_grayscale(x))
        return x * alphas["c"] + ref * (1.0 - alphas["c"])

    def apply_s(x):
        if not saturation:
            return x
        return x * alphas["s"] + _grayscale(x) * (1.0 - alphas["s"])

    fns = [apply_b, apply_c, apply_s]
    orders = []
    import itertools
    for perm in itertools.permutations(range(3)):
        orders.append(lambda x, p=perm: fns[p[2]](fns[p[1]](fns[p[0]](x))))
    idx = jax.random.randint(k_perm, (), 0, len(orders))
    return jax.lax.switch(idx, orders, x)


def clip_lighting_jitter(rng: jax.Array, clip: jax.Array, *, alphastd: float,
                         eigval, eigvec) -> jax.Array:
    """AlexNet-style PCA lighting noise, one draw per clip (reference
    lighting_jitter, transform.py:413-460).  eigval [3], eigvec [3,3]."""
    if alphastd == 0:
        return clip.astype(jnp.float32)
    alpha = alphastd * jax.random.normal(rng, (1, 3))
    eigval = jnp.asarray(eigval, jnp.float32).reshape(1, 3)
    eigvec = jnp.asarray(eigvec, jnp.float32)
    rgb = jnp.sum(eigvec * alpha * eigval, axis=1)       # [3]
    return clip.astype(jnp.float32) + rgb


@partial(jax.jit, static_argnames=("crop", "min_size", "max_size", "train",
                                   "inception", "flip", "randaug",
                                   "pre_cropped", "resize_type", "scale_min",
                                   "scale_max"))
def augment_clip_batch(rng: jax.Array, clips: jax.Array, *, crop: int = 224,
                       min_size: int = 256, max_size: int = 320,
                       train: bool = True, inception: bool = False,
                       flip: bool = True, randaug: str | None = None,
                       pre_cropped: bool = False,
                       resize_type: str = "random_resized_crop",
                       scale_min: float = 0.08,
                       scale_max: float = 1.0) -> jax.Array:
    """[B, T, H, W, C] uint8 -> [B, T, crop, crop, C] normalized float32.

    ``randaug`` (e.g. "rand-m7-n4-mstd0.5-inc1", the SSv2 recipe,
    video_datasets/video_datasets.py:58) applies the same sampled ops to every
    frame of a clip, matching the reference's per-clip transform instance
    (transform.py:628-662)."""
    if train:
        if randaug is not None:
            from dynamic_tuning_tpu.data.randaugment import (parse_config,
                                                             rand_augment)
            m, n_ops, mstd, inc = parse_config(randaug)

            def aug_clip(r, clip):
                # same rng for all frames -> temporally consistent ops;
                # bicubic warps = the reference video recipe's
                # interpolation='bicubic' (k400.py:133)
                return jax.vmap(lambda f: rand_augment(
                    r, f, magnitude=m, num_ops=n_ops, mstd=mstd,
                    interpolation="bicubic", increasing=inc))(clip)

            r_ra, rng = jax.random.split(rng)
            ra_rngs = jax.random.split(r_ra, clips.shape[0])
            clips = jax.vmap(aug_clip)(ra_rngs, clips).astype(jnp.uint8)

        def one(r, clip):
            r1, r2 = jax.random.split(r)
            if resize_type == "random_resized_crop":
                # reference train default (k400.py:42, sthv2_dataset.py:42)
                out = clip_random_resized_crop(r1, clip, crop=crop,
                                               scale=(scale_min, scale_max))
            else:  # "random_short_side_scale_jitter"
                out = clip_scale_jitter_crop(r1, clip, min_size=min_size,
                                             max_size=max_size, crop=crop)
            return clip_hflip(r2, out) if flip else out

        rngs = jax.random.split(rng, clips.shape[0])
        out = jax.vmap(one)(rngs, clips)
    elif pre_cropped:
        # host already produced the spatial view crops (VideoDataset
        # spatial_size path) — only normalization remains
        out = clips.astype(jnp.float32)
    else:
        out = jax.vmap(lambda c: clip_uniform_crop(
            c, resize_to=min_size, crop=crop, spatial_idx=1,
            num_crops=1))(clips)
    return normalize(out, inception)
