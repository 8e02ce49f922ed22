"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

Each test pins one fix:
1. `FileListDataset.__getitem__` honors ``self.square`` so the Python
   thread-pool loader fallback yields the same no-aug square-resize pixels
   as the native C++ loader (which reads the attr via getattr).
2. The VTAB branch of ``build_image_dataset`` only guards the
   ``vtab_num_classes`` name lookup with ``except KeyError`` — an error
   raised while CONSTRUCTING a genuine VTAB task propagates instead of
   silently falling through to the full-dataset/ImageFolder branch.
3. ``Runner`` warns when --resume and --start_epoch are combined (the LR
   schedule offset stacks on the restored optimizer step count).
"""

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

from dynamic_tuning_tpu.data import datasets as D
from dynamic_tuning_tpu.data.fine_grained import FileListDataset


def _img(path, w=80, h=40):
    """A non-square gradient image so square-vs-aspect resizes differ."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
           * np.ones((h, 1, 3), np.uint8))
    Image.fromarray(arr).save(path)


def test_filelist_square_reaches_decode(tmp_path):
    """ADVICE r4 #1: ds.square must reach decode_canvas in the Python
    __getitem__ path, not only the native loader's getattr read."""
    p = str(tmp_path / "a.png")
    _img(p)
    ds = FileListDataset([(p, 0)], num_classes=1, canvas=64)

    ds.square = False
    aspect_px, _ = ds[0]
    ds.square = True
    square_px, _ = ds[0]

    np.testing.assert_array_equal(aspect_px, D.decode_canvas(p, 64, False))
    np.testing.assert_array_equal(square_px, D.decode_canvas(p, 64, True))
    # a non-square source makes the two protocols actually differ
    assert not np.array_equal(aspect_px, square_px)


def test_vtab_construction_errors_propagate(tmp_path, monkeypatch):
    """ADVICE r4 #2: a KeyError raised while BUILDING a VTAB task must
    surface, not be swallowed by the name-lookup guard and resurface as an
    unrelated ImageFolder error."""

    def boom(*a, **kw):
        raise KeyError("construction bug inside the VTAB branch")

    monkeypatch.setattr(D, "ImageFilelist", boom)
    with pytest.raises(KeyError, match="construction bug"):
        D.build_image_dataset("cifar", str(tmp_path))

    # and a missing filelist for a genuine VTAB name is a clear
    # file-not-found on the filelist path, not a fall-through error
    monkeypatch.undo()
    with pytest.raises(FileNotFoundError, match="train800val200.txt"):
        D.build_image_dataset("cifar", str(tmp_path))


def test_resume_plus_start_epoch_warns(tmp_path):
    """ADVICE r4 #3: --resume with --start_epoch stacks the schedule offset
    on the restored optimizer count — the Runner must say so."""
    from dynamic_tuning_tpu.config import (DataConfig, ModelConfig,
                                           OptimConfig, RunConfig,
                                           SelectConfig, TuningConfig)
    from dynamic_tuning_tpu.train.runner import Runner

    cfg = RunConfig(
        model=ModelConfig(img_size=32, patch_size=8, num_classes=100,
                          embed_dim=64, depth=2, num_heads=4),
        tuning=TuningConfig(ffn_num=8, d_model=64), select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=16, num_workers=2),
        output_dir=str(tmp_path), compute_dtype="float32")
    Runner(cfg).run()
    ckpts = sorted(p for p in tmp_path.iterdir()
                   if p.name.startswith("checkpoint-"))
    log = tmp_path / "log_rank0.txt"
    assert "--resume with --start_epoch" not in log.read_text()

    Runner(cfg.replace(resume=str(ckpts[-1]), start_epoch=1,
                       optim=dataclasses.replace(cfg.optim, epochs=2)))
    assert "--resume with --start_epoch" in log.read_text()
