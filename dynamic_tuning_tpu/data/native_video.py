"""ctypes bindings for the native C++ video decoder (native/dyt_video.cpp).

The reference decodes video with decord (K400, k400.py:115-117) and PyAV
(SSv2, sthv2_dataset.py:115-121) — Python wrappers around libav.  This is
our own native layer over the same libraries, registered as the preferred
``VideoDataset`` backend ("native") ahead of decord/av/cv2.

Falls back gracefully: ``available()`` is False when the library can't be
built/loaded, and the Python backends take over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dyt_video.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libdyt_video.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        # Compile to a per-process temp path and publish with an atomic
        # rename: concurrent DataLoader workers may all trigger the build,
        # and racing g++ writes to one .so path cause sporadic CDLL failures.
        tmp = f"{_SO}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp,
                 "-lavformat", "-lavcodec", "-lavutil", "-lswscale"],
                check=True, capture_output=True)
            os.replace(tmp, _SO)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.dyt_video_probe.restype = ctypes.c_int
    lib.dyt_video_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dyt_video_decode.restype = ctypes.c_int
    lib.dyt_video_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Tuple[int, int, int]:
    """-> (num_frames, height, width); raises on unreadable files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native video decoder unavailable")
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dyt_video_probe(path.encode(), ctypes.byref(n), ctypes.byref(h),
                           ctypes.byref(w)) != 0:
        raise IOError(f"cannot probe video: {path}")
    return n.value, h.value, w.value


def read_frames(path: str, want: List[int]) -> Dict[int, np.ndarray]:
    """-> {index: RGB uint8 HxWx3} at full resolution — the same contract
    as the decord/av/cv2 readers in data/video.py."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native video decoder unavailable")
    _, h, w = probe(path)
    order = sorted(set(int(i) for i in want))
    buf = np.empty((len(order), h, w, 3), np.uint8)
    idx = (ctypes.c_int * len(order))(*order)
    filled = lib.dyt_video_decode(
        path.encode(), idx, len(order),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    if filled <= 0:
        raise IOError(f"cannot decode video: {path}")
    frames = {i: buf[j] for j, i in enumerate(order[:filled])}
    if filled < len(order):  # degenerate stream: clamp to last decoded
        last = frames[order[filled - 1]]
        for i in order[filled:]:
            frames[i] = last
    return frames
