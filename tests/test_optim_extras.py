"""LARS / layer-decay / mixup tests (reference util/lars.py, util/lr_decay.py,
timm Mixup hook)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.data.mixup import mixup_cutmix, soft_cross_entropy
from dynamic_tuning_tpu.train.optim import (lars, layerwise_lr_decay_mask,
                                            make_optimizer)


def test_lars_step_moves_params_and_skips_1d_decay():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = lars(0.1, weight_decay=1e-4, momentum=0.9)
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0
    # 1-D param update is plain momentum*lr (no trust scaling)
    np.testing.assert_allclose(np.asarray(updates["b"]), -0.1 * 0.5, rtol=1e-5)


def test_layer_decay_mask_ordering():
    params = {
        ("cls_token",): jnp.zeros(1),
        ("blocks_0", "w"): jnp.zeros(1),
        ("blocks_11", "w"): jnp.zeros(1),
        ("head", "kernel"): jnp.zeros(1),
    }
    scales = layerwise_lr_decay_mask(params, num_layers=12, decay_rate=0.65)
    assert scales[("cls_token",)] < scales[("blocks_0", "w")] \
        < scales[("blocks_11", "w")] < scales[("head", "kernel")]
    assert scales[("head", "kernel")] == 1.0


def test_make_optimizer_with_layer_decay_runs():
    params = {("blocks_0", "w"): jnp.ones((3, 3)),
              ("head", "kernel"): jnp.ones((3, 3))}
    tx = make_optimizer(1e-2, steps_per_epoch=5, warmup_epochs=0,
                        layer_decay=0.65, params=params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # deeper layer gets smaller updates
    assert (jnp.abs(updates[("blocks_0", "w")]).mean()
            < jnp.abs(updates[("head", "kernel")]).mean())


def test_mixup_soft_labels_sum_to_one():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 16, 16, 3))
    y = jnp.arange(8) % 4
    xm, soft = mixup_cutmix(rng, x, y, num_classes=4)
    assert xm.shape == x.shape and soft.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    loss = soft_cross_entropy(jax.random.normal(rng, (8, 4)), soft)
    assert np.isfinite(float(loss))


def test_lars_matches_reference_torch_formula():
    """5 LARS steps vs the reference implementation's exact update rule
    (util/lars.py, MoCo-v3 LARS): trust ratio on >1-D params only, momentum
    buffer mu = m*mu + dp, p -= lr*mu."""
    import torch

    from dynamic_tuning_tpu.train.optim import lars

    lr, wd, mom, tc = 0.1, 0.01, 0.9, 0.001
    rs = np.random.RandomState(0)
    p0 = {"w": rs.randn(6, 5).astype(np.float32),
          "b": rs.randn(5).astype(np.float32)}
    grads = [{"w": rs.randn(6, 5).astype(np.float32),
              "b": rs.randn(5).astype(np.float32)} for _ in range(5)]

    # jax side
    tx = lars(lr, weight_decay=wd, momentum=mom, trust_coefficient=tc)
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                               state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    # torch reference formula
    tp = {k: torch.from_numpy(v.copy()) for k, v in p0.items()}
    mu = {k: torch.zeros_like(v) for k, v in tp.items()}
    for g in grads:
        for k in tp:
            dp = torch.from_numpy(g[k].copy())
            if tp[k].ndim > 1:
                dp = dp + wd * tp[k]
                pn, un = torch.norm(tp[k]), torch.norm(dp)
                q = (tc * pn / un) if (pn > 0 and un > 0) else 1.0
                dp = dp * q
            mu[k] = mom * mu[k] + dp
            tp[k] = tp[k] - lr * mu[k]

    for k in tp:
        np.testing.assert_allclose(np.asarray(params[k]), tp[k].numpy(),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
