"""DyT VisionTransformer forward tests (reference vision_transformer_IN21K.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer


def _build(tiny_model_cfg, tiny_tuning_cfg, select=SelectConfig(), dtype=jnp.float32):
    model = VisionTransformer(tiny_model_cfg, tuning=tiny_tuning_cfg,
                              select=select, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, tiny_model_cfg.img_size, tiny_model_cfg.img_size, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    return model, params, x


def test_forward_shapes(tiny_model_cfg, tiny_tuning_cfg):
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg)
    logits, aux = model.apply({"params": params}, x)
    T = tiny_model_cfg.num_patches
    L = tiny_model_cfg.depth
    assert logits.shape == (2, tiny_model_cfg.num_classes)
    assert aux["token_select"].shape == (2, L, T, 1)
    assert aux["token_logits"].shape == (2, L, T, 1)


def test_keep_layers_skips_routers(tiny_model_cfg, tiny_tuning_cfg):
    sel = SelectConfig(keep_layers=1)
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg, select=sel)
    _, aux = model.apply({"params": params}, x)
    # only depth - keep_layers routed blocks contribute
    assert aux["token_select"].shape[1] == tiny_model_cfg.depth - 1
    assert "mlp_token_select" not in params["blocks_0"]
    assert "mlp_token_select" in params["blocks_1"]


def test_select_closed_no_gates(tiny_model_cfg, tiny_tuning_cfg):
    sel = SelectConfig(open=False)
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg, select=sel)
    logits, aux = model.apply({"params": params}, x)
    assert aux["token_select"] is None and aux["token_logits"] is None


def test_adapter_zero_init_complete_equals_dense_vit(tiny_model_cfg, tiny_tuning_cfg):
    """At init the adapter contributes 0, so the complete_model forward equals
    a plain (router-less, adapter-less in effect) ViT forward."""
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg)
    l_complete, _ = model.apply({"params": params}, x, complete_model=True)
    sel_off = SelectConfig(open=False)
    model_off = VisionTransformer(tiny_model_cfg, tuning=tiny_tuning_cfg,
                                  select=sel_off, dtype=jnp.float32)
    # reuse the same params (router params simply unused)
    l_off, _ = model_off.apply({"params": params}, x, complete_model=False)
    np.testing.assert_allclose(np.asarray(l_complete), np.asarray(l_off),
                               rtol=1e-5, atol=1e-5)


def test_train_mode_stochastic_gates(tiny_model_cfg, tiny_tuning_cfg):
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg)
    rngs = {"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    logits, aux = model.apply({"params": params}, x, training=True, rngs=rngs)
    ts = np.asarray(aux["token_select"])
    assert set(np.unique(ts)).issubset({0.0, 1.0})
    assert 0.2 < ts.mean() < 0.8  # zero-ish logits at init -> ~0.5


def test_gradients_flow_to_router_through_mask(tiny_model_cfg, tiny_tuning_cfg):
    """Straight-through: d(loss)/d(router params) must be nonzero even though
    the forward gate is binary."""
    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg)
    rngs = {"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}

    def loss(p):
        logits, aux = model.apply({"params": p}, x, training=True, rngs=rngs)
        return logits.sum() + aux["token_select"].sum()

    grads = jax.grad(loss)(params)
    g = grads["blocks_0"]["mlp_token_select"]["mlp_head"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
