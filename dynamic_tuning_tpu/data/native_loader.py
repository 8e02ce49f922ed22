"""ctypes bindings for the native C++ data loader (native/dyt_loader.cpp).

Drop-in alternative to the Python ``DataLoader`` for file-list datasets
(ImageFolder / VTAB filelists): JPEG/PNG decode + resize run in a C++ worker
pool with a bounded prefetch queue — the TPU-native equivalent of the
reference's torch DataLoader worker processes (main_image.py:169-183).

Falls back gracefully: ``available()`` is False when the shared library can't
be built/loaded, and callers keep using the Python loader.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from dynamic_tuning_tpu.data._native_build import build_and_load

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "dyt_loader.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libdyt_loader.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = build_and_load(_SRC, _SO, ["-ljpeg", "-lpng", "-lpthread"])
    if lib is None:
        return None
    lib.dyt_loader_create.restype = ctypes.c_void_p
    lib.dyt_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dyt_loader_num_batches.restype = ctypes.c_int64
    lib.dyt_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.dyt_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dyt_loader_next.restype = ctypes.c_int
    lib.dyt_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.dyt_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.dyt_loader_decode_failures.restype = ctypes.c_int64
    lib.dyt_loader_decode_failures.argtypes = [ctypes.c_void_p]
    lib.dyt_loader_error.restype = ctypes.c_int
    lib.dyt_loader_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int]
    lib.dyt_decode_resize.restype = ctypes.c_int
    lib.dyt_decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, canvas: int,
                  square: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((canvas, canvas, 3), np.uint8)
    ok = lib.dyt_decode_resize(
        path.encode(), canvas, int(square),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if ok else None


class NativeDataLoader:
    """File-list batch loader backed by the C++ worker pool.

    Same protocol as data.loader.DataLoader: ``set_epoch``, ``__len__``,
    ``__iter__`` yielding (uint8 [B,canvas,canvas,3], int32 [B]).
    """

    def __init__(self, samples: List[Tuple[str, int]], batch_size: int, *,
                 canvas: int = 256, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, num_workers: int = 4,
                 prefetch: int = 4, process_index: int = 0,
                 process_count: int = 1, square: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (g++/libjpeg missing)")
        self._lib = lib
        self.batch_size = batch_size
        self.canvas = canvas
        self.epoch = 0
        paths = (ctypes.c_char_p * len(samples))(
            *[s[0].encode() for s in samples])
        labels = np.asarray([s[1] for s in samples], np.int32)
        self._handle = lib.dyt_loader_create(
            paths, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(samples), batch_size, canvas, num_workers, prefetch,
            int(shuffle), int(drop_last), seed, process_index, process_count,
            int(square))
        self._nb = lib.dyt_loader_num_batches(self._handle)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        return int(self._nb)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._lib.dyt_loader_start_epoch(self._handle, self.epoch)
        imgs = np.zeros((self.batch_size, self.canvas, self.canvas, 3), np.uint8)
        labels = np.zeros((self.batch_size,), np.int32)
        fails0 = self._lib.dyt_loader_decode_failures(self._handle)
        while True:
            n = self._lib.dyt_loader_next(
                self._handle,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if n < 0:  # a worker thread died on a C++ exception
                buf = ctypes.create_string_buffer(512)
                self._lib.dyt_loader_error(self._handle, buf, 512)
                raise RuntimeError(
                    f"native loader worker failed: {buf.value.decode()}")
            if n == 0:
                fails = self._lib.dyt_loader_decode_failures(self._handle)
                if fails > fails0:
                    import logging
                    logging.getLogger("dyt").warning(
                        "native loader zero-filled %d undecodable image(s) "
                        "this epoch", fails - fails0)
                return
            yield imgs[:n].copy(), labels[:n].copy()

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.dyt_loader_destroy(self._handle)
            self._handle = None
