"""Persistent XLA compilation cache for the CLI entry points.

TPU-native quality-of-life the torch reference has no counterpart for:
every `jit` program here is traced once and compiled by XLA (2-4 min for
the big train/serve programs over a tunneled chip), and the compiled
binary is keyed only by (HLO, compiler flags, topology) — so re-invoking
a CLI (a VTAB sweep task, a resumed run, a serving restart) can reuse
yesterday's compile from disk instead of paying it again.

Enabled for the CLIs only (never at library import, so tests and embedded
use keep JAX's defaults):

  DYT_COMPILE_CACHE=<dir>  use <dir>
  DYT_COMPILE_CACHE=0      disable
  unset                    default ~/.cache/dynamic_tuning_tpu/xla
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir, or None when disabled.  Idempotent; never
    raises (an unwritable dir or an older jax just leaves caching off).
    """
    global _done
    env = os.environ.get("DYT_COMPILE_CACHE", "")
    if env in ("0", "false", "off"):
        return None
    path = env or os.path.join(os.path.expanduser("~"), ".cache",
                               "dynamic_tuning_tpu", "xla")
    if _done:
        return path
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the default 1 s floor skips tiny kernels (they recompile faster
        # than a disk read); keep it — only the multi-second programs the
        # cache exists for are persisted
        _done = True
        return path
    except Exception:
        return None
