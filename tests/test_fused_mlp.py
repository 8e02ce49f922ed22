"""Pallas fused LN+MLP kernel vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_tuning_tpu.ops.fused_mlp import fused_ln_mlp, ln_mlp_reference

M, C, H = 40, 64, 256   # M deliberately not a tile multiple (tests padding)


@pytest.fixture(scope="module")
def tensors():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    x = jax.random.normal(ks[0], (M, C), jnp.float32)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[1], (C,))
    ln_b = 0.1 * jax.random.normal(ks[2], (C,))
    w1 = jax.random.normal(ks[3], (C, H)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (H,))
    w2 = jax.random.normal(ks[5], (H, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (C,))
    gate = (jax.random.uniform(ks[7], (M, 1)) > 0.5).astype(jnp.float32)
    return x, ln_s, ln_b, w1, b1, w2, b2, gate


def test_fused_matches_reference_no_gate(tensors):
    x, ln_s, ln_b, w1, b1, w2, b2, gate = tensors
    got = fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, tile_m=16,
                       interpret=True)
    ref = ln_mlp_reference(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_fused_matches_reference_with_gate(tensors):
    x, ln_s, ln_b, w1, b1, w2, b2, gate = tensors
    got = fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, gate, tile_m=16,
                       interpret=True)
    ref = ln_mlp_reference(x, ln_s, ln_b, w1, b1, w2, b2, gate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)
    # gated-off rows are exactly zero
    off = np.asarray(gate)[:, 0] == 0
    np.testing.assert_array_equal(np.asarray(got)[off], 0.0)


def test_fused_gelu_tanh_variant(tensors):
    x, ln_s, ln_b, w1, b1, w2, b2, _ = tensors
    got = fused_ln_mlp(x, ln_s, ln_b, w1, b1, w2, b2, tile_m=16,
                       gelu_approx=True, interpret=True)
    ref = ln_mlp_reference(x, ln_s, ln_b, w1, b1, w2, b2, gelu_approx=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_fused_bf16_input(tensors):
    x, ln_s, ln_b, w1, b1, w2, b2, _ = tensors
    xb = x.astype(jnp.bfloat16)
    got = fused_ln_mlp(xb, ln_s, ln_b, w1, b1, w2, b2, tile_m=16,
                       interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (M, C)
