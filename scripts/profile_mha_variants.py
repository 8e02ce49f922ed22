"""Isolate cost centers inside the fused serving MHA kernel.

Variants (all [B,N,3C] -> [B,N,C], garbage numerics where noted):
  full      : the real kernel (scores, exp, AV, div)
  noexp     : exp replaced by identity cast    -> isolates transcendental cost
  nodiv     : division removed                 -> isolates the epilogue
  kt        : k^T precomputed outside (XLA transpose), in-kernel A@B only
  matmuls   : scores + AV only, no softmax at all
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, H, hd = 128, 197, 12, 64
C = H * hd
ITERS = 30
REPEATS = 5


def timeit_scan(fn, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            perturbed = (a[0] + c * 1e-12,) + a[1:]
            return fn(*perturbed).astype(jnp.float32).sum(), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def make_kernel(mode):
    scale = hd ** -0.5

    def kernel(qkv_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * hd), 1)
        left = lane < hd
        for p in range(H // 2):
            qp = qkv_ref[0, :, 2 * hd * p: 2 * hd * (p + 1)]
            kp = qkv_ref[0, :, C + 2 * hd * p: C + 2 * hd * (p + 1)]
            vp = qkv_ref[0, :, 2 * C + 2 * hd * p: 2 * C + 2 * hd * (p + 1)]
            qp = (qp.astype(jnp.float32) * scale).astype(qp.dtype)
            q0 = jnp.where(left, qp, jnp.zeros_like(qp))
            q1 = qp - q0
            dn = (((1,), (1,)), ((), ()))
            s0 = jax.lax.dot_general(q0, kp, dn, preferred_element_type=jnp.float32)
            s1 = jax.lax.dot_general(q1, kp, dn, preferred_element_type=jnp.float32)
            if mode == "matmuls":
                p0, p1 = s0.astype(qp.dtype), s1.astype(qp.dtype)
                l0 = l1 = None
            elif mode == "noexp":
                p0 = jnp.clip(s0, -60.0, 80.0).astype(qp.dtype)
                p1 = jnp.clip(s1, -60.0, 80.0).astype(qp.dtype)
                l0 = jnp.sum(s0, axis=-1, keepdims=True)
                l1 = jnp.sum(s1, axis=-1, keepdims=True)
            else:
                e0 = jnp.exp(jnp.clip(s0, -60.0, 80.0) - 20.0)
                e1 = jnp.exp(jnp.clip(s1, -60.0, 80.0) - 20.0)
                p0, p1 = e0.astype(qp.dtype), e1.astype(qp.dtype)
                l0 = jnp.sum(e0, axis=-1, keepdims=True)
                l1 = jnp.sum(e1, axis=-1, keepdims=True)
            dn2 = (((1,), (0,)), ((), ()))
            o0 = jax.lax.dot_general(p0, vp, dn2, preferred_element_type=jnp.float32)
            o1 = jax.lax.dot_general(p1, vp, dn2, preferred_element_type=jnp.float32)
            o = jnp.where(left, o0, o1)
            if mode in ("full", "noexp"):
                l = jnp.where(left, l0, l1)
                o = o / l
            o_ref[0, :, 2 * hd * p: 2 * hd * (p + 1)] = o.astype(o_ref.dtype)

    return kernel


def run_plain(mode, qkv):
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv)


def kt_kernel(qkv_ref, kt_ref, o_ref):
    scale = hd ** -0.5
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * hd), 1)
    left = lane < hd
    for p in range(H // 2):
        qp = qkv_ref[0, :, 2 * hd * p: 2 * hd * (p + 1)]
        ktp = kt_ref[0, p]                               # [2hd, N]
        vp = qkv_ref[0, :, 2 * C + 2 * hd * p: 2 * C + 2 * hd * (p + 1)]
        qp = (qp.astype(jnp.float32) * scale).astype(qp.dtype)
        q0 = jnp.where(left, qp, jnp.zeros_like(qp))
        q1 = qp - q0
        dn = (((1,), (0,)), ((), ()))
        s0 = jax.lax.dot_general(q0, ktp, dn, preferred_element_type=jnp.float32)
        s1 = jax.lax.dot_general(q1, ktp, dn, preferred_element_type=jnp.float32)
        e0 = jnp.exp(jnp.clip(s0, -60.0, 80.0) - 20.0)
        e1 = jnp.exp(jnp.clip(s1, -60.0, 80.0) - 20.0)
        l0 = jnp.sum(e0, axis=-1, keepdims=True)
        l1 = jnp.sum(e1, axis=-1, keepdims=True)
        dn2 = (((1,), (0,)), ((), ()))
        o0 = jax.lax.dot_general(e0.astype(qp.dtype), vp, dn2,
                                 preferred_element_type=jnp.float32)
        o1 = jax.lax.dot_general(e1.astype(qp.dtype), vp, dn2,
                                 preferred_element_type=jnp.float32)
        o = jnp.where(left, o0, o1) / jnp.where(left, l0, l1)
        o_ref[0, :, 2 * hd * p: 2 * hd * (p + 1)] = o.astype(o_ref.dtype)


def run_kt(qkv):
    k = qkv[:, :, C:2 * C].reshape(B, N, H // 2, 2 * hd)
    kt = k.transpose(0, 2, 3, 1)                         # [B, H/2, 2hd, N]
    return pl.pallas_call(
        kt_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H // 2, 2 * hd, N), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv, kt)


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)

    from dynamic_tuning_tpu.ops.mha_serving import mha_fused_reference
    o_ref = jax.jit(lambda x: mha_fused_reference(x, heads=H))(qkv)

    for mode in ("full", "noexp", "matmuls"):
        fn = functools.partial(run_plain, mode)
        t = timeit_scan(jax.jit(fn), qkv)
        print(f"{mode:10s}: {t:8.3f} ms")
    o_kt = jax.jit(run_kt)(qkv)
    err = jnp.max(jnp.abs(o_kt.astype(jnp.float32) - o_ref.astype(jnp.float32)))
    print(f"{'kt':10s}: {timeit_scan(jax.jit(run_kt), qkv):8.3f} ms   max_err={err:.2e}")


if __name__ == "__main__":
    main()
