"""Timing utilities for the axon-tunneled chip.

The tunnel adds a large, drifting per-call round-trip (~25ms observed), so
naive per-call timing is garbage.  ``device_time`` cancels it by timing the
same scan at two iteration counts and differencing:

    t(I) = RTT + I * per_iter   =>   per_iter = (t(I2) - t(I1)) / (I2 - I1)

Repeats interleave the two counts so drift in RTT/chip speed mostly cancels.
"""
import time

import jax
import jax.numpy as jnp

I1, I2 = 5, 55
REPEATS = 5


def _make_scan(fn, iters, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            # Loop-carried perturbation so XLA cannot hoist fn out of the
            # scan as loop-invariant.  It must be NONZERO-representable in
            # the operand dtype: the old `(c * 1e-30).astype(dtype)` is
            # identically zero for int8 and underflows fp8/bf16-adjacent
            # types, letting XLA run the matmul ONCE for any scan length
            # (profile_fp8 measured 9024 TOPS int8 from exactly that).
            # (c != 0) is 0/1 in every dtype; matmul timing on the MXU is
            # data-independent, so the value change is free.
            p = (c != jnp.float32(0)).astype(a[0].dtype)
            perturbed = (a[0] + p,) + a[1:]
            return fn(*perturbed).astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return out
    _ = float(many(*args))  # compile + warm
    return many

def device_time(fn, *args, i1=I1, i2=I2, repeats=REPEATS):
    """Per-iteration device time of fn(*args), seconds, tunnel-RTT-free."""
    m1 = _make_scan(fn, i1, *args)
    m2 = _make_scan(fn, i2, *args)
    best1 = best2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(m1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(m2(*args))
        best2 = min(best2, time.perf_counter() - t0)
    return (best2 - best1) / (i2 - i1)


def ambient_tflops():
    """Ambient bf16 matmul rate (TFLOPS) via a 1000-iter scan spread —
    the differenced device time (~94 ms healthy) dwarfs the tunnel's
    ~25 ms RTT jitter.  Best-of-3 per side; returns None when the
    difference is non-positive (never a nonsense negative TFLOPS —
    that bug shipped in round 2's bench artifact).

    bench.py carries its own inline copy by design: the driver artifact
    must stay self-contained."""
    a = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048), jnp.bfloat16)

    def mm_many(iters):
        @jax.jit
        def f(aa):
            def body(c, _):
                return ((aa + (c != 0).astype(aa.dtype)) @ aa).astype(jnp.float32).sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return out

        _ = float(f(a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(a))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (mm_many(1005) - mm_many(5)) / 1000
    return 2 * 2048 ** 3 / dt / 1e12 if dt > 0 else None
