"""Can a per-sample [197,768]@[768,2304] matmul with VMEM-resident weights
run near peak inside a Pallas grid?  Decides the fused-sublayer kernel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_util import device_time

B, N, C = 128, 197, 768


def kernel(x_ref, w_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def run(x, w):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, 3 * C), x.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, 3 * C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, w)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C), jnp.bfloat16) * 0.02

    t = device_time(jax.jit(run), x, w)
    tf = 2 * B * N * C * 3 * C / t / 1e12
    print(f"pallas per-sample qkv: {t*1e3:7.3f} ms  {tf:6.1f} TFLOPS")

    xla = jax.jit(lambda x, w: jnp.dot(x.reshape(B * N, C), w,
                                       preferred_element_type=jnp.bfloat16))
    t = device_time(xla, x, w)
    print(f"xla batched qkv      : {t*1e3:7.3f} ms  {2*B*N*C*3*C/t/1e12:6.1f} TFLOPS")


if __name__ == "__main__":
    main()
