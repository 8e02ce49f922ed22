"""Loss parity tests against torch (reference models/losses.py,
engine_finetune.py:47-65).  torch (CPU) is used ONLY as a numerical oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from dynamic_tuning_tpu.config import SelectConfig
from dynamic_tuning_tpu.train import losses as L


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, size=(8,))
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(tF.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - ref) < 1e-5


def test_token_budget_loss_squared_error():
    cfg = SelectConfig(token_target_ratio=0.5)
    ts = jnp.ones((2, 3, 4, 1)) * 0.75
    got = float(L.token_budget_loss(ts, cfg))
    assert abs(got - (0.75 - 0.5) ** 2) < 1e-7


def test_token_budget_minimal_term_matches_torch():
    """Parity vs reference models/losses.py:63-84 (_get_token_loss) at
    nonzero token_minimal_weight: the minimal term clamps the per-(batch,
    layer) mean over *tokens* against the floor, then sums."""
    cfg = SelectConfig(token_target_ratio=0.5, token_minimal=0.4,
                       token_minimal_weight=1.5)
    rng = np.random.RandomState(7)
    ts = (rng.rand(2, 3, 16, 1) > 0.6).astype(np.float32)
    got = float(L.token_budget_loss(jnp.asarray(ts), cfg))

    # reference formula, token_select (b, layers, tokens)
    t = torch.tensor(ts[..., 0])
    ref = (t.mean() - 0.5) ** 2
    ref = ref + 1.5 * (0.4 - t.mean(-1)).clamp(min=0.0).sum()
    assert abs(got - float(ref)) < 1e-6


def test_distillation_kl_matches_torch():
    rng = np.random.RandomState(1)
    s = rng.randn(6, 12).astype(np.float32)
    t = rng.randn(6, 12).astype(np.float32)
    ours = float(L.distillation_kl(jnp.asarray(s), jnp.asarray(t)))
    ref = float(tF.kl_div(tF.log_softmax(torch.tensor(s), dim=-1),
                          tF.log_softmax(torch.tensor(t), dim=-1),
                          reduction="batchmean", log_target=True))
    assert abs(ours - ref) < 1e-5


def test_distillation_teacher_detached():
    s = jnp.asarray(np.random.RandomState(2).randn(4, 5).astype(np.float32))
    t = jnp.asarray(np.random.RandomState(3).randn(4, 5).astype(np.float32))
    g_t = jax.grad(lambda tt: L.distillation_kl(s, tt))(t)
    np.testing.assert_array_equal(np.asarray(g_t), 0.0)
    g_s = jax.grad(lambda ss: L.distillation_kl(ss, t))(s)
    assert float(jnp.abs(g_s).max()) > 0


def test_total_loss_composition():
    cfg = SelectConfig()
    rng = np.random.RandomState(4)
    s = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, size=(4,)))
    ts = jnp.asarray((rng.rand(4, 2, 16, 1) > 0.5).astype(np.float32))
    total, parts = L.dyt_total_loss(s, t, y, ts, cfg)
    recomposed = (parts["base_loss"] + parts["token_loss"]
                  + parts["teacher_loss"] + parts["distillation_loss"])
    assert abs(float(total) - float(recomposed)) < 1e-6
    # token loss weight = 2.0 (reference main_image.py:206)
    expect_tok = 2.0 * float((ts.mean() - 0.5) ** 2)
    assert abs(float(parts["token_loss"]) - expect_tok) < 1e-6
