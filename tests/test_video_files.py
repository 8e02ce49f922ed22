"""Real-file video decode tests: write tiny mp4s with OpenCV, read them back
through VideoDataset (reference k400.py decode path)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dynamic_tuning_tpu.data.video import VideoDataset, build_video_dataset


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    rs = np.random.RandomState(0)
    lines = []
    for i in range(3):
        path = str(d / f"clip{i}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (64, 48))
        assert w.isOpened()
        for t in range(40):
            frame = np.full((48, 64, 3), (i * 60 + t) % 256, np.uint8)
            w.write(frame)
        w.release()
        lines.append(f"clip{i}.mp4 {i}")
    (d / "train.csv").write_text("\n".join(lines) + "\n")
    (d / "val.csv").write_text("\n".join(lines) + "\n")
    return str(d)


def test_train_clip_decode(video_root):
    ds = VideoDataset(video_root, os.path.join(video_root, "train.csv"),
                      clip_len=4, sampling_rate=4, canvas=32, num_classes=3)
    assert len(ds) == 3
    clip, label = ds[1]
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8
    assert label == 1
    # frames come from the gray-ramp video: values in the expected range
    assert 40 <= clip.mean() <= 140


def test_test_mode_multiview(video_root):
    ds = VideoDataset(video_root, os.path.join(video_root, "val.csv"),
                      clip_len=4, sampling_rate=4, canvas=32, test_mode=True,
                      test_num_segment=3, test_num_crop=1, num_classes=3)
    views, label = ds[0]
    assert views.shape == (3, 4, 32, 32, 3)
    # temporal views differ (different segments of a ramp video)
    assert not np.array_equal(views[0], views[2])


def test_builder_k400_layout(video_root):
    tr, va, nc = build_video_dataset("k400", video_root, clip_len=4,
                                     sampling_rate=4)
    assert nc == 400
    clip, label = tr[2]
    assert clip.shape[0] == 4 and label == 2
