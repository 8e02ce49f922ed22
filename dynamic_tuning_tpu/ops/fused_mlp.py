"""Pallas fused gated-MLP kernel for the DyT block.

Fuses LayerNorm -> fc1 -> GELU -> fc2 -> gate-multiply into ONE kernel tiled
over token rows.  XLA cannot fuse across two matmuls, so the [M, 4C] hidden
activation (155 MB/bf16 per ViT-B block at batch 128) round-trips HBM twice in
the stock path; here it never leaves VMEM.  Weights (w1+w2 ~ 9.4 MB bf16) stay
resident in VMEM across the row grid.

Used by the efficient-inference path; the jnp reference implementation below
is the numerical oracle (tests run the kernel in interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from dynamic_tuning_tpu.ops.mha_serving import erf_f32 as _erf  # noqa: E402


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            gate_ref, out_ref, *, gelu_approx: bool, has_gate: bool):
    x = x_ref[:].astype(jnp.float32)
    # LayerNorm (eps 1e-6, matching the model's norm2)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)

    h = jnp.dot(xn.astype(jnp.bfloat16), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    if gelu_approx:
        h = jax.nn.gelu(h, approximate=True)
    else:
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
    y = jnp.dot(h.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if has_gate:
        y = y * gate_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gelu_approx", "tile_m",
                                             "interpret"))
def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 gate: Optional[jax.Array] = None, *,
                 gelu_approx: bool = False, tile_m: int = 256,
                 interpret: bool = False) -> jax.Array:
    """out = gate * fc2(gelu(fc1(LN(x)))).

    x: [M, C] (flatten batch*tokens first); gate: [M, 1] or None.
    Returns [M, C] in x.dtype.
    """
    M, C = x.shape
    H = w1.shape[1]
    pad = (-M) % tile_m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        if gate is not None:
            gate = jnp.pad(gate, ((0, pad), (0, 0)))
    Mp = x.shape[0]
    has_gate = gate is not None
    if gate is None:
        gate = jnp.zeros((Mp, 1), x.dtype)   # dummy operand (unused)

    grid = (Mp // tile_m,)
    row_spec = pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, gelu_approx=gelu_approx,
                          has_gate=has_gate),
        grid=grid,
        in_specs=[row_spec, full((C,)), full((C,)), full((C, H)), full((H,)),
                  full((H, C)), full((C,)), gate_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * C * H * 2,
            bytes_accessed=Mp * C * 4 + C * H * 4,
            transcendentals=Mp * H),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1.astype(jnp.bfloat16), b1,
      w2.astype(jnp.bfloat16), b2, gate)
    return out[:M] if pad else out


def ln_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, gate=None,
                     gelu_approx=False):
    """jnp oracle with identical math (for tests and fallback)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
    h = jnp.dot(xn.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=gelu_approx)
    y = jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2
    if gate is not None:
        y = y * gate.astype(jnp.float32)
    return y.astype(x.dtype)
