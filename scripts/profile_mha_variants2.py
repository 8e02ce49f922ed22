"""Second-round fused-MHA variant shootout (RTT-free timing).

base    : current mha_serving_fused g=2
bb2/bb4 : 2/4 samples per program (more ILP for the Mosaic scheduler)
staged  : all score matmuls, then all exps, then all AVs (pipeline-friendly)
bf16exp : scores->bf16 before exp (halves VPU softmax traffic; numerics!)
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_util import device_time
from dynamic_tuning_tpu.ops.mha_serving import (mha_fused_reference,
                                                mha_serving_fused)

B, N, H, hd = 128, 197, 12, 64
C = H * hd
SCALE = hd ** -0.5


def make_call(kernel, bb=1):
    def call(qkv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            grid=(B // bb,),
            in_specs=[pl.BlockSpec((bb, N, 3 * C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, N, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(qkv)
    return call


def kernel_bb(qkv_ref, o_ref):
    bb = qkv_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    left = lane < hd
    for b in range(bb):
        for p in range(H // 2):
            qp = qkv_ref[b, :, 128 * p: 128 * (p + 1)]
            kp = qkv_ref[b, :, C + 128 * p: C + 128 * (p + 1)]
            vp = qkv_ref[b, :, 2 * C + 128 * p: 2 * C + 128 * (p + 1)]
            qp = (qp.astype(jnp.float32) * SCALE).astype(qp.dtype)
            q0 = jnp.where(left, qp, jnp.zeros_like(qp))
            lhs = jnp.concatenate([q0, qp - q0], axis=0)
            s = jax.lax.dot_general(lhs, kp, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            e = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
            l = jnp.sum(e, axis=-1, keepdims=True)
            o_all = jax.lax.dot_general(e.astype(qp.dtype), vp,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            o_all = o_all * (1.0 / l)
            out = (jnp.where(left, o_all[0:N], 0.0)
                   + jnp.where(left, 0.0, o_all[N:2 * N]))
            o_ref[b, :, 128 * p: 128 * (p + 1)] = out.astype(o_ref.dtype)


def kernel_staged(qkv_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    left = lane < hd
    ss = []
    vps = []
    for p in range(H // 2):
        qp = qkv_ref[0, :, 128 * p: 128 * (p + 1)]
        kp = qkv_ref[0, :, C + 128 * p: C + 128 * (p + 1)]
        vps.append(qkv_ref[0, :, 2 * C + 128 * p: 2 * C + 128 * (p + 1)])
        qp = (qp.astype(jnp.float32) * SCALE).astype(qp.dtype)
        q0 = jnp.where(left, qp, jnp.zeros_like(qp))
        lhs = jnp.concatenate([q0, qp - q0], axis=0)
        ss.append(jax.lax.dot_general(lhs, kp, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    es = [jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0) for s in ss]
    ls = [jnp.sum(e, axis=-1, keepdims=True) for e in es]
    for p in range(H // 2):
        o_all = jax.lax.dot_general(es[p].astype(jnp.bfloat16), vps[p],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_all = o_all * (1.0 / ls[p])
        out = (jnp.where(left, o_all[0:N], 0.0)
               + jnp.where(left, 0.0, o_all[N:2 * N]))
        o_ref[0, :, 128 * p: 128 * (p + 1)] = out.astype(o_ref.dtype)


def kernel_bf16exp(qkv_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    left = lane < hd
    for p in range(H // 2):
        qp = qkv_ref[0, :, 128 * p: 128 * (p + 1)]
        kp = qkv_ref[0, :, C + 128 * p: C + 128 * (p + 1)]
        vp = qkv_ref[0, :, 2 * C + 128 * p: 2 * C + 128 * (p + 1)]
        qp = (qp.astype(jnp.float32) * SCALE).astype(qp.dtype)
        q0 = jnp.where(left, qp, jnp.zeros_like(qp))
        lhs = jnp.concatenate([q0, qp - q0], axis=0)
        s = jax.lax.dot_general(lhs, kp, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        sb = (jnp.clip(s, -60.0, 80.0) - 20.0).astype(jnp.bfloat16)
        e = jnp.exp(sb)
        l = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o_all = jax.lax.dot_general(e, vp, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_all = o_all * (1.0 / l)
        out = (jnp.where(left, o_all[0:N], 0.0)
               + jnp.where(left, 0.0, o_all[N:2 * N]))
        o_ref[0, :, 128 * p: 128 * (p + 1)] = out.astype(o_ref.dtype)


def main():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.bfloat16)
    o_ref = jax.jit(lambda x: mha_fused_reference(x, heads=H))(qkv)

    def check(o):
        return float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                     - o_ref.astype(jnp.float32))))

    base = lambda x: mha_serving_fused(x, heads=H, group=2)
    print(f"base g=2      : {device_time(base, qkv)*1e3:7.4f} ms  err={check(base(qkv)):.1e}")
    for bb in (1, 2, 4):
        fn = jax.jit(make_call(kernel_bb, bb))
        print(f"bb={bb} arbitrary: {device_time(fn, qkv)*1e3:7.4f} ms  err={check(fn(qkv)):.1e}")
    fn = jax.jit(make_call(kernel_staged))
    print(f"staged        : {device_time(fn, qkv)*1e3:7.4f} ms  err={check(fn(qkv)):.1e}")
    fn = jax.jit(make_call(kernel_bf16exp))
    print(f"bf16exp       : {device_time(fn, qkv)*1e3:7.4f} ms  err={check(fn(qkv)):.1e}")


if __name__ == "__main__":
    main()
