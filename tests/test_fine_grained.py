"""Fine-grained dataset parser tests: synthesize each upstream layout on disk
and check parsing (reference vendored classes datasets/*.py)."""

import os

import numpy as np
import pytest
from PIL import Image

from dynamic_tuning_tpu.data import fine_grained as FG
from dynamic_tuning_tpu.data.datasets import build_image_dataset


def _img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(path)


def test_food101(tmp_path):
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    (base / "meta" / "train.txt").write_text("pizza/1\nsushi/2\n")
    (base / "meta" / "test.txt").write_text("pizza/3\nsushi/4\n")
    for p in ["pizza/1", "pizza/3", "sushi/2", "sushi/4"]:
        _img(str(base / "images" / (p + ".jpg")))
    ds = FG.food101(str(tmp_path), "train")
    assert len(ds) == 2 and ds.num_classes == 2
    img, lab = ds[0]
    assert img.shape == (256, 256, 3)
    labels = sorted(lab for _, lab in ds.samples)
    assert labels == [0, 1]


def test_dtd(tmp_path):
    base = tmp_path / "dtd"
    (base / "labels").mkdir(parents=True)
    (base / "labels" / "train1.txt").write_text(
        "banded/banded_0002.jpg\nzigzagged/zigzagged_0001.jpg\n")
    for p in ["banded/banded_0002.jpg", "zigzagged/zigzagged_0001.jpg"]:
        _img(str(base / "images" / p))
    ds = FG.dtd(str(tmp_path), "train")
    assert len(ds) == 2 and ds.num_classes == 2


def test_pets(tmp_path):
    base = tmp_path / "oxford-iiit-pet"
    (base / "annotations").mkdir(parents=True)
    (base / "annotations" / "trainval.txt").write_text(
        "Abyssinian_1 1 1 1\nbengal_2 2 1 2\n")
    for n in ["Abyssinian_1", "bengal_2"]:
        _img(str(base / "images" / (n + ".jpg")))
    ds = FG.oxford_pets(str(tmp_path), "train")
    assert len(ds) == 2
    assert ds.metric == "mean_per_class_acc"
    assert sorted(l for _, l in ds.samples) == [0, 1]


def test_aircraft(tmp_path):
    base = tmp_path / "fgvc-aircraft-2013b" / "data"
    base.mkdir(parents=True)
    (base / "images_variant_trainval.txt").write_text(
        "0034309 707-320\n0034958 A320\n")
    for n in ["0034309", "0034958"]:
        _img(str(base / "images" / (n + ".jpg")))
    ds = FG.fgvc_aircraft(str(tmp_path), "train")
    assert len(ds) == 2 and ds.num_classes == 2


def test_flowers102(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "flowers-102"
    base.mkdir(parents=True)
    savemat(str(base / "imagelabels.mat"),
            {"labels": np.array([[5, 6, 7, 8]])})
    savemat(str(base / "setid.mat"),
            {"trnid": np.array([[1, 2]]), "valid": np.array([[3]]),
             "tstid": np.array([[4]])})
    for i in range(1, 5):
        _img(str(base / "jpg" / f"image_{i:05d}.jpg"))
    tr = FG.flowers102(str(tmp_path), "train")
    te = FG.flowers102(str(tmp_path), "test")
    assert len(tr) == 2 and len(te) == 1
    assert tr.samples[0][1] == 4   # label 5 -> 4 (zero-based)


def test_svhn(tmp_path):
    from scipy.io import savemat

    (tmp_path / "svhn").mkdir()
    x = np.random.randint(0, 256, (32, 32, 3, 6), np.uint8)
    y = np.array([[1], [2], [10], [4], [5], [6]], np.uint8)
    savemat(str(tmp_path / "svhn" / "train_32x32.mat"), {"X": x, "y": y})
    savemat(str(tmp_path / "svhn" / "test_32x32.mat"), {"X": x, "y": y})
    ds = FG.svhn(str(tmp_path), "train")
    assert len(ds) == 6 and ds.num_classes == 10
    img, lab = ds[2]
    assert lab == 0   # '10' means digit 0
    assert img.shape == (32, 32, 3)


def test_builder_dispatch(tmp_path):
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    (base / "meta" / "train.txt").write_text("pizza/1\n")
    (base / "meta" / "test.txt").write_text("pizza/2\n")
    _img(str(base / "images" / "pizza/1.jpg"))
    _img(str(base / "images" / "pizza/2.jpg"))
    tr, va, nc, metric = build_image_dataset("food101", str(tmp_path))
    assert nc == 1 and metric == "accuracy"


def test_builder_dispatch_honors_canvas(tmp_path):
    """--canvas / no_aug must reach the filelist-backed builders — they
    construct FileListDataset with a default canvas=256 internally."""
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    (base / "meta" / "train.txt").write_text("pizza/1\n")
    (base / "meta" / "test.txt").write_text("pizza/2\n")
    _img(str(base / "images" / "pizza/1.jpg"))
    _img(str(base / "images" / "pizza/2.jpg"))
    tr, va, _, _ = build_image_dataset("food101_full", str(tmp_path),
                                       canvas=320)
    assert tr.canvas == 320 and va.canvas == 320 and not tr.square
    tr, va, _, _ = build_image_dataset("food101_full", str(tmp_path),
                                       no_aug=True)
    assert tr.canvas == 224 and tr.square and va.square
