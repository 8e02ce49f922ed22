"""VTAB filelist path with real files on disk (reference datasets/vtab.py:54-74
train800val200.txt / test.txt convention)."""

import numpy as np
import pytest
from PIL import Image

from dynamic_tuning_tpu.data.datasets import build_image_dataset
from dynamic_tuning_tpu.data.loader import make_loader


@pytest.fixture(scope="module")
def vtab_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("vtab") / "dtd_vtab"
    (d / "images").mkdir(parents=True)
    rs = np.random.RandomState(0)
    train_lines, test_lines = [], []
    for i in range(12):
        rel = f"images/im{i}.jpg"
        Image.fromarray(rs.randint(0, 256, (40, 50, 3), np.uint8)).save(d / rel)
        (train_lines if i < 8 else test_lines).append(f"{rel} {i % 4}")
    (d / "train800val200.txt").write_text("\n".join(train_lines) + "\n")
    (d / "test.txt").write_text("\n".join(test_lines) + "\n")
    return str(d.parent)


def test_vtab_filelist_build_and_decode(vtab_root):
    train, val, nc, metric = build_image_dataset("dtd_vtab", vtab_root,
                                                 no_aug=True)
    assert nc == 47 and metric == "accuracy"
    assert len(train) == 8 and len(val) == 4
    img, lab = train[0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert 0 <= lab < 4


def test_vtab_filelist_uses_native_loader(vtab_root):
    from dynamic_tuning_tpu.data.native_loader import available

    train, _, _, _ = build_image_dataset("dtd_vtab", vtab_root, no_aug=True)
    dl = make_loader(train, 4, shuffle=True, drop_last=True, num_workers=2)
    if available():
        from dynamic_tuning_tpu.data.native_loader import NativeDataLoader
        assert isinstance(dl, NativeDataLoader)
    dl.set_epoch(0)
    imgs, labels = next(iter(dl))
    assert imgs.shape == (4, 224, 224, 3)
    assert imgs.std() > 10   # real decode happened
