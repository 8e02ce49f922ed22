"""Unit tests for the Gumbel-sigmoid gate (reference dynamic_adapter.py:25-54)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.ops.gumbel import gumbel_sigmoid


def test_eval_is_plain_sigmoid():
    logits = jnp.array([-2.0, 0.0, 3.0])
    out = gumbel_sigmoid(logits, None, tau=5.0, hard=False, training=False)
    np.testing.assert_allclose(out, jax.nn.sigmoid(logits), rtol=1e-6)


def test_eval_hard_thresholds_at_half():
    logits = jnp.array([-0.1, 0.1, 0.0])
    out = gumbel_sigmoid(logits, None, hard=True, training=False)
    np.testing.assert_array_equal(out, jnp.array([0.0, 1.0, 0.0]))


def test_train_soft_mean_matches_sigmoid_of_logits():
    # E[sigmoid((l + Logistic)/tau)] has the same sign structure as sigmoid(l);
    # at l=0 the mean must be 0.5 by symmetry.
    rng = jax.random.PRNGKey(0)
    out = gumbel_sigmoid(jnp.zeros((20000,)), rng, tau=5.0, hard=False)
    assert abs(float(out.mean()) - 0.5) < 0.02


def test_train_hard_is_binary_forward():
    rng = jax.random.PRNGKey(1)
    out = gumbel_sigmoid(jax.random.normal(rng, (1000,)), rng, tau=5.0, hard=True)
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0})


def test_straight_through_gradient_is_soft_gradient():
    # d/dl [hard-gate(l)] must equal d/dl [soft(l)] (straight-through).
    rng = jax.random.PRNGKey(2)

    def hard_sum(l):
        return gumbel_sigmoid(l, rng, tau=5.0, hard=True).sum()

    def soft_sum(l):
        return gumbel_sigmoid(l, rng, tau=5.0, hard=False).sum()

    l = jax.random.normal(jax.random.PRNGKey(3), (64,))
    np.testing.assert_allclose(jax.grad(hard_sum)(l), jax.grad(soft_sum)(l),
                               rtol=1e-6)


def test_rate_tracks_logits():
    # Large positive logits -> keep-rate near 1; large negative -> near 0.
    rng = jax.random.PRNGKey(4)
    hi = gumbel_sigmoid(jnp.full((5000,), 20.0), rng, tau=5.0, hard=True)
    lo = gumbel_sigmoid(jnp.full((5000,), -20.0), rng, tau=5.0, hard=True)
    assert float(hi.mean()) > 0.95
    assert float(lo.mean()) < 0.05
