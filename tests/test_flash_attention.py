"""Pallas flash-attention kernel vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.ops.flash_attention import (attention_reference,
                                                    flash_attention)


def _qkv(B=2, H=3, N=37, D=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, N, D), dtype) for k in ks)


def test_flash_matches_reference_unaligned_seq():
    q, k, v = _qkv(N=37)     # 37 -> padded to 128 internally
    got = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_matches_reference_aligned_seq():
    q, k, v = _qkv(N=128)
    got = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_padding_mask_excludes_pad_keys():
    # identical q/k/v with an outlier key at the last position: padded columns
    # must not receive probability mass
    q, k, v = _qkv(N=5)
    got = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # row sums of implicit softmax==1 is already checked via values; also
    # output shape is unpadded
    assert got.shape == q.shape


def test_flash_bf16_io():
    q, k, v = _qkv(N=64, dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16


def test_flash_long_seq_per_head_grid():
    q, k, v = _qkv(B=1, H=2, N=300, D=16)
    got = flash_attention(q, k, v, interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_with_relpos_bias():
    q, k, v = _qkv(B=2, H=2, N=300, D=16)
    bias = jax.random.normal(jax.random.PRNGKey(7), (2, 300, 300))
    got = flash_attention(q, k, v, bias, interpret=True)
    ref = attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
