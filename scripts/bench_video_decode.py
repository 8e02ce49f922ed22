"""Video decode throughput per backend: native C++ (libav) vs decord vs
PyAV vs cv2 (VERDICT r2 #8 — the decode path had a number only for images).

Generates real mp4s (OpenCV writer, same recipe as
tests/test_video_files.py), then measures steady-state clips/s per worker
for the reference's training access pattern: decode ``clip_len`` sparse
frames per clip (random TSN segments), short-side canvas resize included —
i.e. ``VideoDataset._decode`` end to end, not just the demuxer.

Reference comparator: decord in k400.py:115-117 (K400) and PyAV in
sthv2_dataset.py:115-121 (SSv2); the "decord" row IS the reference path.

Run: python scripts/bench_video_decode.py  (CPU-only; safe anywhere)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIPS = 12
FRAMES_PER_FILE = 64
W, H = 320, 240
CLIP_LEN = 8
ROUNDS = 3


def make_videos(root: str):
    import cv2

    rs = np.random.RandomState(0)
    lines = []
    for i in range(CLIPS):
        path = os.path.join(root, f"clip{i}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                            (W, H))
        base = rs.randint(0, 255, (H, W, 3), np.uint8)
        for f in range(FRAMES_PER_FILE):
            frame = np.roll(base, f * 3, axis=1)
            w.write(frame)
        w.release()
        lines.append(f"clip{i}.mp4 {i % 4}")
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("\n".join(lines))


def bench_backend(root: str, backend: str):
    from dynamic_tuning_tpu.data.video import VideoDataset

    os.environ["DYT_VIDEO_BACKEND"] = backend
    try:
        ds = VideoDataset(root, os.path.join(root, "train.csv"),
                          clip_len=CLIP_LEN, canvas=224)
        if ds.backend != backend:
            return {"backend": backend, "error": "unavailable"}
    except Exception as e:
        return {"backend": backend, "error": f"unavailable: {e}"}
    finally:
        os.environ.pop("DYT_VIDEO_BACKEND", None)
    try:
        _ = ds[0]                                 # warm (lib load, open)
    except Exception as e:
        return {"backend": backend, "error": str(e)}
    n = 0
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        for i in range(len(ds)):
            clip, _ = ds[i]
            n += 1
    dt = time.perf_counter() - t0
    assert clip.shape == (CLIP_LEN, 224, 224, 3)
    return {"backend": backend, "clips_s_per_worker": round(n / dt, 1),
            "ms_per_clip": round(dt / n * 1e3, 1)}


def main():
    with tempfile.TemporaryDirectory() as root:
        make_videos(root)
        rows = []
        for backend in ("native", "decord", "av", "cv2"):
            row = bench_backend(root, backend)
            rows.append(row)
            print(json.dumps(row), flush=True)
        ok = [r for r in rows if "clips_s_per_worker" in r]
        if ok:
            best = max(ok, key=lambda r: r["clips_s_per_worker"])
            print(json.dumps({"fastest": best["backend"],
                              "clips_s": best["clips_s_per_worker"]}))


if __name__ == "__main__":
    main()
