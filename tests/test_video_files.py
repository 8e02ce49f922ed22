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
            # horizontal luminance gradient (codec-proof) so left/center/right
            # spatial crops differ, scaled by a per-clip/-frame ramp
            grad = np.linspace(0, 200, 64, dtype=np.uint8)[None, :, None]
            frame = np.broadcast_to(grad, (48, 64, 3)).copy()
            frame += np.uint8((i * 60 + t) % 56)
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


def test_spatial_multicrop_views_differ(video_root):
    """SSv2 3-spatial-crop protocol: the 3 views are REAL left/center/right
    crops (reference video_datasets/k400.py:281-300), not copies."""
    ds = VideoDataset(video_root, os.path.join(video_root, "val.csv"),
                      clip_len=4, sampling_rate=0, test_mode=True,
                      test_num_segment=1, test_num_crop=3, num_classes=3,
                      spatial_size=32)
    views, _ = ds[0]
    assert views.shape == (3, 4, 32, 32, 3)
    left, center, right = views
    # the source frames are 48x64 -> short side 32 resize gives 32x43 frames;
    # crops slide along width over the horizontal gradient
    assert left[..., 0].mean() < center[..., 0].mean() < right[..., 0].mean()
    assert not np.array_equal(left, center)
    assert not np.array_equal(center, right)


def test_spatial_crops_match_reference_slices():
    """spatial_crops == the reference's offsets (0, margin//2, margin) along
    the long axis and a centered short axis."""
    frames = np.arange(2 * 32 * 50 * 3, dtype=np.uint8).reshape(2, 32, 50, 3)
    crops = VideoDataset.spatial_crops(frames, 32, 3)
    margin = 50 - 32
    for crop, st in zip(crops, (0, margin // 2, margin)):
        np.testing.assert_array_equal(crop, frames[:, :, st:st + 32])
    (center,) = VideoDataset.spatial_crops(frames, 32, 1)
    np.testing.assert_array_equal(center, frames[:, :, 9:41])
    # tall frames: crops slide along height
    tall = frames.transpose(0, 2, 1, 3)
    crops = VideoDataset.spatial_crops(tall, 32, 3)
    for crop, st in zip(crops, (0, margin // 2, margin)):
        np.testing.assert_array_equal(crop, tall[:, st:st + 32, :])


def test_builder_k400_layout(video_root):
    tr, va, nc = build_video_dataset("k400", video_root, clip_len=4,
                                     sampling_rate=4)
    assert nc == 400
    clip, label = tr[2]
    assert clip.shape[0] == 4 and label == 2


def test_native_decoder_matches_cv2(video_root):
    """The C++ decoder (native/dyt_video.cpp) returns the same frames as the
    cv2 backend (both libav underneath; identical yuv->rgb within rounding)."""
    from dynamic_tuning_tpu.data import native_video
    from dynamic_tuning_tpu.data.video import (_read_frames_cv2,
                                               _read_frames_native)

    if not native_video.available():
        pytest.skip("native video decoder unavailable")
    path = os.path.join(video_root, "clip0.mp4")
    n, h, w = native_video.probe(path)
    assert (h, w) == (48, 64) and n >= 38   # metadata may under/over-count
    want = [0, 5, 17, 33]
    got = _read_frames_native(path, want)
    ref = _read_frames_cv2(path, want)
    assert set(got) == set(want)
    for i in want:
        assert got[i].shape == ref[i].shape == (48, 64, 3)
        diff = np.abs(got[i].astype(np.int16) - ref[i].astype(np.int16))
        assert diff.mean() < 2.0, (i, diff.mean())


def test_native_decoder_clamps_past_end(video_root):
    from dynamic_tuning_tpu.data import native_video

    if not native_video.available():
        pytest.skip("native video decoder unavailable")
    path = os.path.join(video_root, "clip1.mp4")
    frames = native_video.read_frames(path, [39, 500])
    assert np.array_equal(frames[500], frames[39])


def test_video_dataset_native_backend(video_root, monkeypatch):
    from dynamic_tuning_tpu.data import native_video

    if not native_video.available():
        pytest.skip("native video decoder unavailable")
    monkeypatch.setenv("DYT_VIDEO_BACKEND", "native")
    ds = VideoDataset(video_root, os.path.join(video_root, "train.csv"),
                      clip_len=4, sampling_rate=4, canvas=32, num_classes=3)
    assert ds.backend == "native"
    clip, label = ds[2]
    assert clip.shape == (4, 32, 32, 3) and label == 2
    assert 40 <= clip.mean() <= 160


def test_native_decoder_all_indices_past_end(video_root):
    """Probe overestimates on metadata-poor streams can put EVERY wanted
    index past EOF; the decoder must clamp to the last real frame instead
    of returning nothing (review finding)."""
    from dynamic_tuning_tpu.data import native_video

    if not native_video.available():
        pytest.skip("native video decoder unavailable")
    path = os.path.join(video_root, "clip1.mp4")
    got = native_video.read_frames(path, [300, 400])
    last = native_video.read_frames(path, [39])[39]
    assert np.array_equal(got[300], last) and np.array_equal(got[400], last)
