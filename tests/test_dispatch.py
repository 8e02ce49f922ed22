"""Capacity-bounded dispatch tests: the efficient-inference path must agree
with the mask-multiply eval path whenever the kept-token count fits the
capacity (reference semantics: model_speed_test.py gather == masked dense)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.ops.dispatch import (capacity_for, dispatch_mlp,
                                             gather_tokens, scatter_tokens,
                                             select_topk)


def test_capacity_rounding():
    assert capacity_for(196, 0.5) == 99           # ceil(98)+1, exact
    assert capacity_for(196, 1.0) == 197          # clamped to T+1
    assert capacity_for(16, 0.25) == 5            # ceil(4)+1
    assert capacity_for(196, 0.5, multiple=16) == 112


def test_select_topk_threshold_mask():
    scores = jnp.array([[jnp.inf, 0.9, 0.4, 0.6, 0.2]])
    idx, mask = select_topk(scores, 4, threshold=0.5)
    picked = set(np.asarray(idx)[0].tolist())
    assert 0 in picked and 1 in picked and 3 in picked
    got = {int(i): bool(m) for i, m in zip(np.asarray(idx)[0], np.asarray(mask)[0])}
    assert got[0] and got[1] and got[3]
    assert not got[2]  # in top-4 but below threshold -> masked out


def test_gather_scatter_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
    idx = jnp.array([[0, 3, 5], [1, 2, 7]])
    mask = jnp.ones((2, 3), bool)
    g = gather_tokens(x, idx)
    s = scatter_tokens(x, idx, g, mask)
    for b in range(2):
        for j, t in enumerate(np.asarray(idx)[b]):
            np.testing.assert_allclose(s[b, t], x[b, t], rtol=1e-6)
    # non-selected rows are zero
    assert float(jnp.abs(s[0, 1]).max()) == 0.0


def test_dispatch_mlp_equals_masked_dense():
    """When every above-threshold token fits in capacity, dispatch == mask."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 16, 8))
    scores = jax.random.uniform(jax.random.PRNGKey(1), (3, 16))
    scores = scores.at[:, 0].set(jnp.inf)

    def mlp_fn(t):
        return t * 2.0 + 1.0

    out = dispatch_mlp(x, scores, capacity=16, mlp_fn=mlp_fn)
    gate = (scores > 0.5)[..., None]
    ref = jnp.where(gate, mlp_fn(x), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_vit_dispatch_matches_mask_eval(tiny_model_cfg, tiny_tuning_cfg):
    """Full-model check: eval with dispatch=True == eval mask-multiply when
    capacity covers all tokens (capacity_ratio=1.0)."""
    sel = SelectConfig(capacity_ratio=1.0)
    model = VisionTransformer(tiny_model_cfg, tuning=tiny_tuning_cfg,
                              select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    l_mask, aux_mask = model.apply({"params": params}, x)
    l_disp, aux_disp = model.apply({"params": params}, x, dispatch=True)
    np.testing.assert_allclose(np.asarray(l_mask), np.asarray(l_disp),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(aux_mask["token_select"]),
                                  np.asarray(aux_disp["token_select"]))


def test_vit_dispatch_capacity_bound(tiny_model_cfg, tiny_tuning_cfg):
    """With a tight capacity, the per-block kept count never exceeds K."""
    sel = SelectConfig(capacity_ratio=0.25)
    model = VisionTransformer(tiny_model_cfg, tuning=tiny_tuning_cfg,
                              select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    _, aux = model.apply({"params": params}, x, dispatch=True)
    T = tiny_model_cfg.num_patches           # 16
    K = capacity_for(T, 0.25)                # 16 (rounded)
    counts = np.asarray(aux["token_select"]).sum(axis=2)  # [B, L, 1]
    assert counts.max() <= K
