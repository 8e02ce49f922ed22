"""Shared build-and-load helper for the native C++ extensions.

Both ctypes wrappers (native_loader, native_video) compile their .so on
first use.  The build goes to a per-process temp path published with an
atomic rename: concurrent DataLoader worker processes may all trigger the
build, and racing g++ writes to one .so path cause sporadic CDLL failures
(round-2 advisor finding).  One copy of that logic lives here so a fix
can't silently diverge between the two wrappers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional


def build_and_load(src: str, so: str,
                   link_libs: List[str]) -> Optional[ctypes.CDLL]:
    """Compile ``src`` to ``so`` (if missing/stale) and CDLL-load it.

    Returns None when the toolchain or libraries are unavailable — callers
    fall back to their Python backends."""
    if not os.path.exists(so) or (os.path.exists(src) and
                                  os.path.getmtime(src) > os.path.getmtime(so)):
        tmp = f"{so}.{os.getpid()}.tmp"
        built = False
        # -march=native vectorizes the resample/decode hot loops; retry
        # plain -O3 on toolchains that reject it
        for extra in (["-march=native"], []):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", *extra, src,
                     "-o", tmp] + link_libs,
                    check=True, capture_output=True)
                os.replace(tmp, so)
                built = True
                break
            except (subprocess.CalledProcessError, FileNotFoundError, OSError):
                continue
        if not built:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None
