"""with_tau: the gate-temperature scheduling hook (reference set_tau,
dynamic_adapter.py:67).  Functional clone semantics: new tau changes the
training-time soft gate exactly as sigmoid((l+n)/tau) predicts; eval gates
(no tau in the reference eval formula) are unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer, with_tau


def _model(tau=5.0):
    mc = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                     depth=2, num_heads=4)
    return VisionTransformer(mc, tuning=TuningConfig(ffn_num=8, d_model=64,
                                                     dropout=0.0),
                             select=SelectConfig(tau=tau), dtype=jnp.float32)


def test_with_tau_matches_explicit_construction():
    base = _model(5.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = base.init(jax.random.PRNGKey(1), x)["params"]

    hot = with_tau(base, 0.5)
    assert hot.select.tau == 0.5 and base.select.tau == 5.0  # clone, not mutate
    explicit = _model(0.5)

    rngs = {"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    _, aux_hot = hot.apply({"params": params}, x, training=True, rngs=rngs)
    _, aux_exp = explicit.apply({"params": params}, x, training=True,
                                rngs=rngs)
    np.testing.assert_array_equal(np.asarray(aux_hot["token_select"]),
                                  np.asarray(aux_exp["token_select"]))


def test_tau_does_not_change_eval_gate():
    """Reference eval formula is sigmoid(logits) > 0.5 — no tau
    (dynamic_adapter.py:44-49 eval branch)."""
    base = _model(5.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = base.init(jax.random.PRNGKey(1), x)["params"]
    _, aux_a = base.apply({"params": params}, x)
    _, aux_b = with_tau(base, 0.01).apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(aux_a["token_select"]),
                                  np.asarray(aux_b["token_select"]))
