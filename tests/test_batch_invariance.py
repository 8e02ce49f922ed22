"""Serving outputs must be batch-invariant: a sample's logits can't depend
on which other samples share its batch.

This is the contract behind the round-2 advisor fix (per-SAMPLE int8
activation scales in the stem/convs — a per-batch amax made outputs depend
on batch composition) and behind capacity dispatch being per-sample top-k.
Pins all three serving modes: mask, dispatch, and int8 (interpret kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer


def _model(quant="none"):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4, quant=quant, gelu_approx=True)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(), dtype=jnp.float32)
    # adversarial batch: sample 0 is small-magnitude, the rest are huge —
    # a batch-level activation scale would crush sample 0's int8 resolution
    rs = np.random.RandomState(0)
    x = rs.randn(4, 32, 32, 3).astype(np.float32)
    x[0] *= 0.05
    x[1:] *= 8.0
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    for i in range(cfg.depth):
        params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] = (
            params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] * 60)
    return model, params, jnp.asarray(x)


@pytest.mark.parametrize("mode", ["mask", "dispatch"])
def test_bf16_serving_batch_invariant(mode):
    model, params, x = _model()
    full, _ = model.apply({"params": params}, x, dispatch=mode == "dispatch")
    solo, _ = model.apply({"params": params}, x[:1], dispatch=mode == "dispatch")
    np.testing.assert_allclose(np.asarray(solo[0]), np.asarray(full[0]),
                               rtol=1e-5, atol=1e-5)


def test_int8_serving_batch_invariant(monkeypatch):
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    model, params, x = _model(quant="int8")
    full, _ = model.apply({"params": params}, x)
    solo, _ = model.apply({"params": params}, x[:1])
    # per-SAMPLE activation scales -> identical quantization decisions for
    # sample 0 regardless of batch mates; remaining delta is only matmul
    # reduction-order noise
    np.testing.assert_allclose(np.asarray(solo[0]), np.asarray(full[0]),
                               rtol=1e-4, atol=1e-4)
