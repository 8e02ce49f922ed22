"""Numerical fidelity at the reference's REAL operating point: ViT-B/16,
224^2, 197 tokens, 12 blocks, 768 dim (main_image.py:219-256 loads
jx_vit_base_patch16_224_in21k at exactly this shape; smoke block
vision_transformer_IN21K.py:424-430).

The torch-oracle state dict is regenerated deterministically from a seed
with IN21K-like weight statistics (tests/torch_oracle.py) and the oracle
runs at test time, so no 344 MB fixture is committed.  Covers, at full
shape: the XLA serving path (no-max softmax + deferred normalization), the
fused Pallas kernels (interpret mode), the capacity dispatch path, the bf16
serving dtype, and the int8 W8A8 stack with a quantified delta.

Seed 5 was selected for a healthy router margin (min |router logit| 0.048
over 12 x 196 x 2 gate decisions) so the hard sigmoid>0.5 gates are stable
against cross-framework float noise; margins are re-asserted here.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.checkpoint import import_pretrained

from torch_oracle import image_oracle, make_vit_state_dict

pytestmark = pytest.mark.fullscale

DEPTH, DIM, HEADS, FFN = 12, 768, 12, 64
CLASSES, IMG, PATCH, B = 1000, 224, 16, 2
SEED = 5


@pytest.fixture(scope="module")
def oracle():
    rs = np.random.RandomState(SEED)
    sd = make_vit_state_dict(rs, depth=DEPTH, dim=DIM, ffn=FFN,
                             classes=CLASSES, img=IMG, patch=PATCH)
    x = np.clip(rs.randn(B, IMG, IMG, 3), -2.6, 2.6).astype(np.float32)
    logits, gates, margin = image_oracle(sd, x, depth=DEPTH, heads=HEADS,
                                         patch=PATCH)
    logits_t, _, _ = image_oracle(sd, x, depth=DEPTH, heads=HEADS,
                                  patch=PATCH, complete_model=True)
    assert margin > 0.02, f"router margin degraded: {margin}"
    return sd, x, logits, gates, logits_t


def _build(quant="none", dtype=jnp.float32, capacity=None):
    mc = ModelConfig(num_classes=CLASSES, quant=quant)
    sel = (SelectConfig(capacity_ratio=capacity) if capacity is not None
           else SelectConfig())
    return VisionTransformer(mc, tuning=TuningConfig(ffn_num=FFN),
                             select=sel, dtype=dtype)


@pytest.fixture(scope="module")
def params(oracle):
    sd, x = oracle[0], oracle[1]
    model = _build()
    p = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    p, missing = import_pretrained(p, sd)
    assert missing == []
    return p


def test_vitb_full_shape_eval_and_teacher(oracle, params):
    """fp32 XLA serving path vs torch at full ViT-B shape: <=1e-3 logits,
    bit-identical gates (4704 hard decisions)."""
    sd, x, want, gates, want_t = oracle
    model = _build()
    ours, aux = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-3)
    assert np.abs(np.asarray(ours) - want).max() < 1e-4  # headroom on record
    np.testing.assert_array_equal(
        np.asarray(aux["token_select"])[..., 0], gates)
    assert 0.2 < gates.mean() < 0.8  # gates non-degenerate at full scale

    ours_t, _ = model.apply({"params": params}, jnp.asarray(x),
                            complete_model=True)
    np.testing.assert_allclose(np.asarray(ours_t), want_t, atol=1e-3)


def test_vitb_full_shape_fused_kernels(oracle, params, monkeypatch):
    """The Pallas fused serving kernels (interpret mode = same kernel code
    the TPU runs, minus Mosaic lowering) reproduce torch at full shape."""
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    sd, x, want = oracle[0], oracle[1], oracle[2]
    ours, _ = _build().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-3)


def test_vitb_full_shape_dispatch(oracle, params):
    """Capacity dispatch (one-hot-matmul gather/scatter) at capacity 1.0
    must be numerically the mask path: same logits as the torch oracle."""
    sd, x, want = oracle[0], oracle[1], oracle[2]
    ours, _ = _build(capacity=1.0).apply({"params": params}, jnp.asarray(x),
                                         dispatch=True)
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-3)


def test_vitb_full_shape_bf16_serving(oracle, params):
    """bf16 serving dtype at full depth: logits within 3e-2 of fp32 torch
    and argmax-preserving (the serving default documented in BENCH.md)."""
    sd, x, want = oracle[0], oracle[1], oracle[2]
    ours, _ = _build(dtype=jnp.bfloat16).apply({"params": params},
                                               jnp.asarray(x))
    ours = np.asarray(ours, np.float32)
    assert np.abs(ours - want).max() < 3e-2
    assert (ours.argmax(-1) == want.argmax(-1)).all()


def test_vitb_full_shape_int8_delta(oracle, params, monkeypatch):
    """Quantified int8 W8A8 delta at full shape: softmax-probability L1
    <= 3e-2 per sample, logits within 1.5e-1.  (Argmax identity is pinned on
    the realistic-margin golden fixture, tests/test_quant.py — random-weight
    1000-class logits here are near-ties by construction, so argmax is not a
    meaningful int8 metric at this operating point.)"""
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    sd, x, want = oracle[0], oracle[1], oracle[2]
    ours, _ = _build(quant="int8", dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.asarray(x))
    ours = np.asarray(ours, np.float32)
    assert np.abs(ours - want).max() < 1.5e-1

    def sm(z):
        e = np.exp(z - z.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    l1 = np.abs(sm(ours) - sm(want)).sum(-1)
    assert l1.max() < 3e-2, f"int8 prob-L1 {l1.max()}"
