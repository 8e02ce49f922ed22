"""A/B device cost of the PIL-exact train crop (round-4) vs the old
fused scale_and_translate path, on-device at the train operating point
(b64/b128, 256-canvas -> 224).  Interleaved via device_time (RTT-immune).

The PIL-exact path is the fidelity default; this records what it costs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np
from bench_util import device_time

from dynamic_tuning_tpu.data import transforms as T


def _old_rrc(rng, img, out_size):
    """Round-3 path: single fused scale_and_translate over the canvas."""
    h, w = img.shape[0], img.shape[1]
    top, left, ch, cw = T._sample_crop_box(rng, h, w)
    return T._resize_crop(img, top, left, ch, cw, out_size)


def make_aug(rrc, out_size):
    def one(r, img):
        r1, r2 = jax.random.split(r)
        return T.hflip(r2, rrc(r1, img, out_size))

    def batch(imgs):
        rngs = jax.random.split(jax.random.PRNGKey(0), imgs.shape[0])
        return T.normalize(jax.vmap(one)(rngs, imgs))

    return batch


def main():
    for b in (64, 128):
        imgs = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (b, 256, 256, 3),
                                              dtype=np.uint8))
        new = make_aug(lambda r, i, o: T._pil_resized_crop(
            i, *T._sample_crop_box(r, i.shape[0], i.shape[1]), o), 224)
        old = make_aug(_old_rrc, 224)
        t_new = device_time(new, imgs)
        t_old = device_time(old, imgs)
        print(f"b{b}: old fused {t_old*1e3:.3f} ms  "
              f"new PIL-exact {t_new*1e3:.3f} ms  "
              f"delta {(t_new-t_old)*1e3:+.3f} ms "
              f"({(t_new/t_old-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
