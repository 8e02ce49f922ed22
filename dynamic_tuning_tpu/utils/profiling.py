"""Profiling / tracing utilities.

The reference has no profiler integration (SURVEY.md §5); its closest tool is
the wall-clock harness with cuda.synchronize fencing (speed.py:258-264).  The
TPU-native equivalents:

  * ``trace(dir)`` — context manager around ``jax.profiler`` producing an
    xplane trace viewable in TensorBoard/XProf;
  * ``Timer`` — fenced wall-clock section timing via ``block_until_ready``;
  * ``scan_throughput`` — the remote-device-safe throughput measurement used
    by bench.py (N serialized iterations inside one device program, one
    readback), immune to per-call tunnel latency.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Fenced section timer: ``with Timer() as t: ... ; t.ms``."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self.t0) * 1e3
        return False

    def fence(self, x):
        jax.block_until_ready(x)
        return x


def scan_throughput(apply_once: Callable, args: Sequence, *, batch: int,
                    iters: int = 50, repeats: int = 3,
                    warmup_iters: Optional[int] = None) -> float:
    """img/s for ``apply_once(*args) -> scalar``; iterations serialized via a
    carry perturbation so XLA cannot elide or overlap them.

    ``warmup_iters`` is the number of forward iterations to run before
    timing (rounded up to whole scan calls); default = one scan call."""

    @jax.jit
    def many(*a):
        def body(c, _):
            out = apply_once(a[0], a[1] + c * 1e-12, *a[2:])
            return out.astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out

    warm_calls = (1 if warmup_iters is None
                  else max(1, -(-warmup_iters // iters)))
    for _ in range(warm_calls):
        _ = float(many(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best
