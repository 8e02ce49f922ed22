"""Data pipeline tests: on-device augmentation + loader sharding."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.data.datasets import SyntheticDataset, build_image_dataset
from dynamic_tuning_tpu.data.loader import DataLoader
from dynamic_tuning_tpu.data import transforms as T


def test_synthetic_builder():
    tr, va, nc, metric = build_image_dataset("synthetic", "")
    assert nc == 100 and metric == "accuracy"
    img, lab = tr[0]
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert 0 <= lab < nc


def test_loader_batches_and_sharding():
    ds = SyntheticDataset(n=100, size=32, num_classes=10)
    dl = DataLoader(ds, batch_size=16, shuffle=True, drop_last=True,
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == 6 == len(dl)
    imgs, labels = batches[0]
    assert imgs.shape == (16, 32, 32, 3) and labels.shape == (16,)

    # two-process strided shard covers the dataset disjointly
    d0 = DataLoader(ds, batch_size=16, process_index=0, process_count=2)
    d1 = DataLoader(ds, batch_size=16, process_index=1, process_count=2)
    i0 = d0._indices()
    i1 = d1._indices()
    assert len(set(i0) & set(i1)) == 0
    assert len(i0) + len(i1) == 100


def test_loader_epoch_reshuffle():
    ds = SyntheticDataset(n=64, size=8, num_classes=10)
    dl = DataLoader(ds, batch_size=64, shuffle=True)
    dl.set_epoch(0)
    a = dl._indices().copy()
    dl.set_epoch(1)
    b = dl._indices().copy()
    assert not np.array_equal(a, b)
    dl.set_epoch(0)
    np.testing.assert_array_equal(a, dl._indices())


def test_augment_batch_shapes_and_range():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.randint(0, 256, (4, 256, 256, 3), np.uint8))
    out = T.augment_batch(rng, imgs, out_size=224, train=True)
    assert out.shape == (4, 224, 224, 3) and out.dtype == jnp.float32
    # normalized range sanity (imagenet stats)
    assert float(out.min()) > -3.0 and float(out.max()) < 3.0


def test_augment_train_is_stochastic_eval_deterministic():
    imgs = jnp.asarray(np.random.randint(0, 256, (2, 256, 256, 3), np.uint8))
    a = T.augment_batch(jax.random.PRNGKey(0), imgs, train=True)
    b = T.augment_batch(jax.random.PRNGKey(1), imgs, train=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    e1 = T.augment_batch(jax.random.PRNGKey(0), imgs, train=False)
    e2 = T.augment_batch(jax.random.PRNGKey(1), imgs, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_center_crop_resize_geometry():
    # a 256x256 canvas with a distinctive center: eval crop keeps the center
    img = np.zeros((256, 256, 3), np.uint8)
    img[112:144, 112:144] = 255
    out = T.center_crop_resize(jnp.asarray(img), 256, 224)
    assert out.shape == (224, 224, 3)
    assert float(out[112, 112, 0]) > 200.0      # center stays bright
    assert float(out[5, 5, 0]) < 10.0


def test_normalize_inception_vs_imagenet():
    x = jnp.full((1, 2, 2, 3), 128, jnp.uint8)
    inc = T.normalize(x, inception=True)
    np.testing.assert_allclose(np.asarray(inc), (128 / 255 - 0.5) / 0.5,
                               rtol=1e-4, atol=1e-6)
    imnet = T.normalize(x, inception=False)
    assert not np.allclose(np.asarray(inc), np.asarray(imnet))


def test_random_resized_crop_covers_full_image_when_scale_1():
    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.randint(0, 256, (64, 64, 3), np.uint8))
    out = T.random_resized_crop(rng, img, 32, scale=(1.0, 1.0),
                                ratio=(1.0, 1.0))
    # reference transforms use interpolation=3 = PIL BICUBIC; the train
    # path is PIL-exact crop-then-resize (±1 fixed-point residue, see
    # tests/test_transforms_pil_parity.py)
    from PIL import Image
    ref = np.asarray(Image.fromarray(np.asarray(img)).resize(
        (32, 32), Image.BICUBIC), dtype=np.float32)
    assert np.abs(np.asarray(out) - ref).max() <= 1.0 + 1e-5


def test_loader_surfaces_decode_errors():
    """A failing __getitem__ must raise in the consumer, not silently end
    the epoch early (a truncated epoch deadlocks multi-host collectives)."""
    import pytest

    from dynamic_tuning_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise IOError("corrupt sample")
            import numpy as np
            return np.zeros((4, 4, 3), np.uint8), 0

    loader = DataLoader(Bad(), batch_size=4, num_workers=2)
    with pytest.raises(IOError, match="corrupt sample"):
        for _ in loader:
            pass


def test_loader_early_break_does_not_hang():
    """Breaking out mid-epoch must release the producer (bounded puts that
    watch the stop event) — a plain q.put would block forever."""
    import threading
    import time

    import numpy as np

    from dynamic_tuning_tpu.data.loader import DataLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.zeros((4, 4, 3), np.uint8), 0

    before = threading.active_count()
    for _ in range(4):
        loader = DataLoader(Slow(), batch_size=4, num_workers=2, prefetch=2)
        for n, _ in enumerate(loader):
            if n == 1:
                break
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    # producers exited rather than blocking forever on a full queue
    assert threading.active_count() <= before + 1


def test_video_sampling_thread_safe_and_epoch_varying():
    """Per-call RandomStates: concurrent __getitem__ draws are deterministic
    per (epoch, index) and change across epochs."""
    import numpy as np

    from dynamic_tuning_tpu.data.video import VideoDataset

    class FakeVideo(VideoDataset):
        def __init__(self):
            self.items = [(f"c{i}.mp4", 0) for i in range(4)]
            self.clip_len, self.rate = 4, 2
            self.test_mode, self.canvas = False, 16
            self.spatial_size = None
            self._seed, self._epoch = 0, 0

        def _num_frames(self, path):
            return 64

        def _decode(self, path, idx):
            return np.asarray(idx)          # expose the sampled indices

    fv = FakeVideo()
    a1, _ = fv[1]
    a2, _ = fv[1]
    np.testing.assert_array_equal(a1, a2)   # deterministic per call
    fv.set_epoch(1)
    b1, _ = fv[1]
    assert not np.array_equal(a1, b1)       # epoch changes the draw
