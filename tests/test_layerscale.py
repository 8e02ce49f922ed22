"""LayerScale (init_values) tests — reference vision_transformer_IN21K.py:78-85."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import Block


def _blk(init_values):
    return Block(num_heads=4, init_values=init_values,
                 tuning=TuningConfig(ffn_num=8, d_model=64, dropout=0.0),
                 select_cfg=SelectConfig(), dtype=jnp.float32)


def test_layerscale_params_created_and_init():
    blk = _blk(1e-5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64))
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    np.testing.assert_allclose(np.asarray(params["ls1_gamma"]), 1e-5)
    np.testing.assert_allclose(np.asarray(params["ls2_gamma"]), 1e-5)


def test_layerscale_none_means_identity_and_no_params():
    blk = _blk(None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64))
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    assert "ls1_gamma" not in params


def test_layerscale_scales_branches():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64))
    blk_small = _blk(1e-6)
    params = blk_small.init(jax.random.PRNGKey(1), x)["params"]
    y_small, _, _ = blk_small.apply({"params": params}, x, complete_model=True)
    # with tiny gamma, the block is nearly the identity (adapter is zero-init)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(x),
                               rtol=1e-3, atol=1e-3)
