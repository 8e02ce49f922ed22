"""Head-packed attention kernel vs oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.ops.packed_attention import (packed_attention,
                                                     packed_attention_reference)


def test_packed_matches_reference_unaligned():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (2, 197, 3 * 256),
                            jnp.float32)
    got = packed_attention(qkv, num_heads=4, interpret=True)
    ref = packed_attention_reference(qkv, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_packed_matches_reference_multi_group():
    # 8 heads -> 2 packed groups
    qkv = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3 * 128),
                            jnp.float32)
    got = packed_attention(qkv, num_heads=8, interpret=True)
    ref = packed_attention_reference(qkv, num_heads=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_packed_bf16():
    qkv = jax.random.normal(jax.random.PRNGKey(2), (1, 197, 3 * 256),
                            jnp.bfloat16)
    got = packed_attention(qkv, num_heads=4, interpret=True)
    assert got.shape == (1, 197, 256) and got.dtype == jnp.bfloat16
