"""Mesh/sharding correctness on the 8-device CPU platform: tensor-parallel
execution must match the DP-only result (same math, different partitioning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.parallel import mesh as M
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_matches_dp_loss_and_updates():
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64,
                                                       dropout=0.0),
                              select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10)
    params = model.init(jax.random.PRNGKey(2), x)["params"]
    tr, fr = partition_params(params)
    tx = make_optimizer(1e-2, warmup_epochs=0, steps_per_epoch=10)

    losses, states = [], []
    for tp in (1, 2):
        mesh = M.make_mesh(model_parallel=tp)
        state = create_train_state(tr, fr, tx, jax.random.PRNGKey(3))
        state = M.shard_state(mesh, state)
        xb, yb = M.shard_batch(mesh, (x, y))
        step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))
        state, parts = step(state, xb, yb)
        losses.append(float(parts["loss"]))
        states.append(state)

    assert abs(losses[0] - losses[1]) < 1e-3, losses
    for k in states[0].trainable:
        np.testing.assert_allclose(np.asarray(states[0].trainable[k]),
                                   np.asarray(states[1].trainable[k]),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_param_shardings_split_matmul_weights():
    from jax.sharding import PartitionSpec as P

    mesh = M.make_mesh(model_parallel=2)
    spec = M.param_spec("blocks_0/attn/qkv/kernel", (64, 192))
    assert spec == P(None, "model")
    spec2 = M.param_spec("blocks_0/mlp/fc2/kernel", (256, 64))
    assert spec2 == P("model", None)
    assert M.param_spec("cls_token", (1, 1, 64)) == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batch_sharding_distributes_over_data_axis():
    mesh = M.make_mesh(model_parallel=1)
    x = jnp.zeros((16, 4))
    xs = M.shard_batch(mesh, x)
    # 8 data shards of 2 rows each
    assert len(xs.sharding.device_set) == 8
    assert xs.sharding.shard_shape(x.shape)[0] == 2
