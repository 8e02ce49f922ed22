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
from typing import Dict, List, Optional, Tuple

import numpy as np

from dynamic_tuning_tpu.data._native_build import build_and_load

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dyt_video.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libdyt_video.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = build_and_load(_SRC, _SO,
                         ["-lavformat", "-lavcodec", "-lavutil", "-lswscale"])
    if lib is None:
        return None
    lib.dyt_video_probe.restype = ctypes.c_int
    lib.dyt_video_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dyt_video_decode.restype = ctypes.c_int
    lib.dyt_video_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    try:
        lib.dyt_resize_bicubic.restype = ctypes.c_int
        lib.dyt_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
    except AttributeError:
        pass  # stale .so without the resize entry point; callers fall back
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


# Probe results are immutable for the life of a training run, but a clip is
# probed once for frame-count sampling and again inside read_frames for h/w;
# on metadata-poor containers the fallback demuxes the WHOLE file to count
# packets — cache so each path is probed once per process.
_PROBE_CACHE: Dict[str, Tuple[int, int, int]] = {}
_PROBE_CACHE_MAX = 65536


def probe(path: str) -> Tuple[int, int, int]:
    """-> (num_frames, height, width); raises on unreadable files."""
    hit = _PROBE_CACHE.get(path)
    if hit is not None:
        return hit
    lib = _load()
    if lib is None:
        raise RuntimeError("native video decoder unavailable")
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.dyt_video_probe(path.encode(), ctypes.byref(n), ctypes.byref(h),
                           ctypes.byref(w)) != 0:
        raise IOError(f"cannot probe video: {path}")
    if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
        _PROBE_CACHE.clear()
    _PROBE_CACHE[path] = (n.value, h.value, w.value)
    return _PROBE_CACHE[path]


def read_frames(path: str, want: List[int]) -> Dict[int, np.ndarray]:
    """-> {index: RGB uint8 HxWx3} at full resolution — the same contract
    as the decord/av/cv2 readers in data/video.py.

    Indices past the real end of stream come back clamped to the last
    decoded frame (done in C++, matching the Python backends' np.minimum
    clamp).  A stream yielding zero decodable frames returns {} so
    VideoDataset._decode zero-fills, like the other backends; only an
    unopenable file raises."""
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
    if filled < 0:
        raise IOError(f"cannot decode video: {path}")
    return {i: buf[j] for j, i in enumerate(order[:filled])}


def resize_bicubic(img: np.ndarray, nh: int, nw: int,
                   idx_h: np.ndarray, wts_h: np.ndarray,
                   idx_w: np.ndarray, wts_w: np.ndarray
                   ) -> Optional[np.ndarray]:
    """4-tap separable resize of an HxWx3 uint8 frame using tap tables from
    ``data/video.py::_tb_taps`` (the torch-bicubic kernel, single-sourced).
    Runs in C with the GIL released — loader threads resize concurrently.
    Returns None when the native library (or the entry point) is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "dyt_resize_bicubic") \
            or getattr(lib.dyt_resize_bicubic, "argtypes", None) is None:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty((nh, nw, 3), np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    f32 = ctypes.POINTER(ctypes.c_float)
    rc = lib.dyt_resize_bicubic(
        img.ctypes.data_as(u8), img.shape[0], img.shape[1],
        idx_h.ctypes.data_as(i32), wts_h.ctypes.data_as(f32), nh,
        idx_w.ctypes.data_as(i32), wts_w.ctypes.data_as(f32), nw,
        out.ctypes.data_as(u8))
    return out if rc == 0 else None
