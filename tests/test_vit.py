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


@pytest.mark.parametrize("mode", ["full", "scores"])
def test_remat_modes_match_no_remat_gradients(tiny_model_cfg, tiny_tuning_cfg,
                                              mode):
    """Rematerialization must not change the math: loss and every gradient
    match the no-remat backward bitwise-closely.  "scores" drops only the
    checkpoint_name-tagged [B,H,N,N] tensors (vit.py policy) — the cheap
    selective mode for big batches."""
    import dataclasses

    model, params, x = _build(tiny_model_cfg, tiny_tuning_cfg)
    model_r = VisionTransformer(
        dataclasses.replace(tiny_model_cfg, remat=mode),
        tuning=tiny_tuning_cfg, select=SelectConfig(), dtype=jnp.float32)
    rngs = {"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}

    def loss(m):
        def f(p):
            logits, aux = m.apply({"params": p}, x, training=True, rngs=rngs)
            return (logits ** 2).mean() + aux["token_select"].mean()
        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(model_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_scores_video_and_seg_backbones(tiny_model_cfg, tiny_tuning_cfg):
    """remat="scores" must also hold for the video (time folded into batch)
    and seg (windowed rel-pos bias) backbones: same loss and gradients as
    the plain backward."""
    import dataclasses

    from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

    rngs = {"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    seg_cfg = dataclasses.replace(tiny_model_cfg, depth=4)  # 4 FPN taps

    for cls, cfg, x in [
        (VideoVisionTransformer, tiny_model_cfg,
         jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))),
        (SegVisionTransformer, seg_cfg,
         jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))),
    ]:
        m0 = cls(cfg, tuning=tiny_tuning_cfg,
                 select=SelectConfig(), dtype=jnp.float32)
        m1 = cls(dataclasses.replace(cfg, remat="scores"),
                 tuning=tiny_tuning_cfg,
                 select=SelectConfig(), dtype=jnp.float32)
        params = m0.init(jax.random.PRNGKey(1), x)["params"]

        def loss(m):
            def f(p):
                out, aux = m.apply({"params": p}, x, training=True, rngs=rngs)
                first = out[0] if isinstance(out, tuple) else out
                return (first.astype(jnp.float32) ** 2).mean()
            return f

        l0, g0 = jax.value_and_grad(loss(m0))(params)
        l1, g1 = jax.value_and_grad(loss(m1))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_routing_requires_class_token():
    """class_token=False + routing silently corrupted budgets (TokenSelect
    scores x[:,1:], dispatch pins position 0, gate stack strips it) — must
    fail loud instead (review finding)."""
    import pytest

    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4, class_token=False,
                      global_pool="avg")
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(open=True),
                              dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="class_token"):
        model.init(jax.random.PRNGKey(0), x)
    # CLS-free works with routing off (dense avg-pool model)
    dense = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(open=False),
                              dtype=jnp.float32)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    logits, aux = dense.apply({"params": params}, x)
    assert logits.shape == (1, 10) and aux["token_select"] is None
