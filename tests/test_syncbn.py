"""SyncBN-parity option for the segmentation heads (reference
tools/seg_train.py:113 uses SyncBN; under SPMD jit, batch stats reduce over
the global sharded batch automatically)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.upernet import DyTSegmentor


def _seg(norm):
    cfg = ModelConfig(img_size=64, patch_size=8, embed_dim=64, depth=4,
                      num_heads=4)
    return DyTSegmentor(cfg, num_classes=5,
                        tuning=TuningConfig(ffn_num=8, d_model=64),
                        select=SelectConfig(), norm=norm, dtype=jnp.float32)


def test_bn_creates_and_updates_batch_stats():
    seg = _seg("bn")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = seg.init(jax.random.PRNGKey(1), x)
    assert "batch_stats" in variables
    bn = variables["batch_stats"]["decode_head"]["psp"]["bottleneck"]["bn"]
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)

    (logits, aux_logits, aux), mutated = seg.apply(
        variables, x, training=True, mutable=["batch_stats"],
        rngs={"gate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)})
    new_bn = mutated["batch_stats"]["decode_head"]["psp"]["bottleneck"]["bn"]
    assert float(jnp.abs(new_bn["mean"]).max()) > 0   # running stats moved
    assert logits.shape == (2, 64, 64, 5)


def test_bn_eval_uses_running_stats():
    seg = _seg("bn")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = seg.init(jax.random.PRNGKey(1), x)
    # eval (training=False) must not require mutation
    logits, _, _ = seg.apply(variables, x, training=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_gn_default_has_no_batch_stats():
    seg = _seg("gn")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = seg.init(jax.random.PRNGKey(1), x)
    assert "batch_stats" not in variables
