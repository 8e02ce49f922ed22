"""On-device Mixup / CutMix.

The reference's train loops expose a ``mixup_fn`` hook that every recipe
leaves None (engine_finetune.py:44 — timm Mixup imported, never enabled).  We
provide the TPU-native equivalent so the hook is real: one jittable function
mixing the batch on device and producing soft labels.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_classes", "alpha", "cutmix_alpha",
                                   "smoothing"))
def mixup_cutmix(rng: jax.Array, images: jax.Array, labels: jax.Array, *,
                 num_classes: int, alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, smoothing: float = 0.1
                 ) -> Tuple[jax.Array, jax.Array]:
    """Mix the batch with its reversal; 50/50 mixup vs cutmix per batch.

    images: [B,H,W,C] float; labels: [B] int -> returns mixed images and
    [B, num_classes] soft labels (with label smoothing).
    """
    B, H, W, _ = images.shape
    k_lam, k_mode, k_box, k_pos = jax.random.split(rng, 4)
    flipped = images[::-1]

    lam = jax.random.beta(k_lam, alpha, alpha)
    use_cutmix = jax.random.bernoulli(k_mode)

    # mixup branch
    mixed = lam * images + (1 - lam) * flipped

    # cutmix branch: box with area (1-lam)
    lam_c = jax.random.beta(k_box, cutmix_alpha, cutmix_alpha)
    cut = jnp.sqrt(1.0 - lam_c)
    ch, cw = (cut * H).astype(jnp.int32), (cut * W).astype(jnp.int32)
    # fresh key for the box position — k_box was consumed by the beta draw
    # (single-use key discipline: size and position must be independent)
    kcy, kcx = jax.random.split(k_pos)
    cy = jax.random.randint(kcy, (), 0, H)
    cx = jax.random.randint(kcx, (), 0, W)
    y0 = jnp.clip(cy - ch // 2, 0, H)
    x0 = jnp.clip(cx - cw // 2, 0, W)
    y1 = jnp.clip(cy + ch // 2, 0, H)
    x1 = jnp.clip(cx + cw // 2, 0, W)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    cutmixed = jnp.where(box, flipped, images)
    lam_cut = 1.0 - ((y1 - y0) * (x1 - x0)) / (H * W)

    out = jnp.where(use_cutmix, cutmixed, mixed)
    lam_eff = jnp.where(use_cutmix, lam_cut, lam)

    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1h = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    y2h = jax.nn.one_hot(labels[::-1], num_classes) * (on - off) + off
    soft = lam_eff * y1h + (1 - lam_eff) * y2h
    return out, soft


def soft_cross_entropy(logits: jax.Array, soft_labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(soft_labels * logp).sum(-1).mean()
