"""Fused serving MHA kernel (ops/mha_serving.py): parity with the XLA
serving branch it replaces, across shapes, in interpret mode (CPU CI).

Replaces the reference's F.scaled_dot_product_attention serving call
(/root/reference/models/vision_transformer_IN21K.py:60-64) on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_tuning_tpu.ops.mha_serving import (mha_fused_reference,
                                                mha_serving_fused,
                                                mha_serving_reference)


@pytest.mark.parametrize("B,N,H,hd", [(2, 17, 12, 64), (1, 197, 2, 64),
                                      (2, 33, 4, 128)])
def test_fused_matches_reference(B, N, H, hd):
    C = H * hd
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C), jnp.float32)
    want = mha_fused_reference(qkv, heads=H)
    got = mha_serving_fused(qkv, heads=H, group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_group_sizes_agree():
    B, N, H, hd = 2, 29, 12, 64
    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3 * H * hd), jnp.float32)
    base = mha_serving_fused(qkv, heads=H, group=2, interpret=True)
    for g in (4, 6, 12):
        got = mha_serving_fused(qkv, heads=H, group=g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)


def test_large_scores_finite():
    # clamped no-max softmax must survive score magnitudes ~100
    B, N, H, hd = 1, 9, 2, 64
    qkv = 40.0 * jax.random.normal(jax.random.PRNGKey(2), (B, N, 3 * H * hd),
                                   jnp.float32)
    out = mha_serving_fused(qkv, heads=H, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_module_fused_path(monkeypatch):
    """Attention with DYT_FUSED_ATTN=interpret == the XLA serving branch."""
    from dynamic_tuning_tpu.models.layers import Attention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 19, 768), jnp.float32)
    attn = Attention(num_heads=12, dtype=jnp.float32)
    monkeypatch.setenv("DYT_FUSED_ATTN", "0")
    params = attn.init(jax.random.PRNGKey(4), x, deterministic=True)
    want = attn.apply(params, x, deterministic=True)
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    got = attn.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_windowed_kernel_matches_biased_softmax():
    """mha_windowed_fused == scores + bias -> clamped softmax -> AV."""
    from dynamic_tuning_tpu.ops.mha_serving import mha_windowed_fused

    B, N, H, hd = 2, 10, 4, 64
    C = H * hd
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    qkv = jax.random.normal(k1, (B, N, 3 * C), jnp.float32)
    bias = jax.random.normal(k2, (H, N, N), jnp.float32)

    q, k, v = jnp.moveaxis(
        qkv.reshape(B, N, 3, H, hd), 2, 0).transpose(0, 1, 3, 2, 4)
    s = jax.lax.dot_general(q * hd ** -0.5, k,
                            (((3,), (3,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32) + bias[None]
    p = jnp.exp(jnp.clip(s, -60.0, 80.0) - 20.0)
    o = jax.lax.dot_general(p, v, (((3,), (2,)), ((0, 1), (0, 1))))
    want = (o / p.sum(-1, keepdims=True)).transpose(0, 2, 1, 3).reshape(B, N, C)

    got = mha_windowed_fused(qkv, bias, heads=H, interpret=True)
    # the bias operand rides in bf16 (halves the hottest HBM operand of the
    # seg forward); tolerance = bf16 resolution of O(1) bias values through
    # the exp — within the bf16 q/k pipeline's own noise floor
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1e-2)

    # and the bf16-bias rounding is the ONLY deviation: an exactly
    # bf16-representable bias reproduces the fp32 oracle to kernel precision
    bias_bf = bias.astype(jnp.bfloat16).astype(jnp.float32)
    s2 = jax.lax.dot_general(q * hd ** -0.5, k,
                             (((3,), (3,)), ((0, 1), (0, 1))),
                             preferred_element_type=jnp.float32) + bias_bf[None]
    p2 = jnp.exp(jnp.clip(s2, -60.0, 80.0) - 20.0)
    o2 = jax.lax.dot_general(p2, v, (((3,), (2,)), ((0, 1), (0, 1))))
    want2 = (o2 / p2.sum(-1, keepdims=True)
             ).transpose(0, 2, 1, 3).reshape(B, N, C)
    got2 = mha_windowed_fused(qkv, bias_bf, heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)


def test_attention_windowed_fused_matches_unfused(monkeypatch):
    """Windowed Attention (seg/BEiT) through the bias-aware kernel == the XLA
    branch, with identical param trees."""
    from dynamic_tuning_tpu.models.layers import Attention

    wh = ww = 3
    N = wh * ww + 1
    x = jax.random.normal(jax.random.PRNGKey(7), (2, N, 256), jnp.float32)
    attn = Attention(num_heads=2, window_size=(wh, ww), qv_bias_only=True,
                     dtype=jnp.float32)
    monkeypatch.setenv("DYT_FUSED_ATTN", "0")
    params = attn.init(jax.random.PRNGKey(8), x, deterministic=True)
    # give the zero-init bias table real values so the bias path is exercised
    params = jax.tree_util.tree_map(lambda v: v, params)
    tbl = params["params"]["relative_position_bias_table"]
    params["params"]["relative_position_bias_table"] = (
        0.5 * jax.random.normal(jax.random.PRNGKey(9), tbl.shape))
    want = attn.apply(params, x, deterministic=True)

    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    params_fused = attn.init(jax.random.PRNGKey(8), x, deterministic=True)
    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    got = attn.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sublayer_kernel_matches_composition():
    """attention_sublayer_serving == LN -> qkv -> core -> proj -> +x."""
    from dynamic_tuning_tpu.ops.mha_serving import (
        attention_sublayer_reference, attention_sublayer_serving)

    B, N, H, hd = 2, 23, 4, 64
    C = H * hd
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    x = jax.random.normal(ks[0], (B, N, C), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
    wqkv = jax.random.normal(ks[3], (C, 3 * C), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[4], (3 * C,), jnp.float32) * 0.05
    wproj = jax.random.normal(ks[5], (C, C), jnp.float32) * 0.05
    bproj = jax.random.normal(ks[6], (C,), jnp.float32) * 0.05
    want = attention_sublayer_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                        bproj, heads=H)
    got = attention_sublayer_serving(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_fused_sublayer_matches_unfused(monkeypatch):
    """Block with DYT_FUSED_ATTN=interpret == the unfused Block, and the
    param trees of both branches are identical (checkpoint compatibility)."""
    from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.layers import Block

    blk = Block(num_heads=2, tuning=TuningConfig(ffn_num=8, d_model=128),
                select_cfg=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 128), jnp.float32)

    monkeypatch.setenv("DYT_FUSED_ATTN", "0")
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    want, want_gate, _ = blk.apply({"params": params}, x)

    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    params_fused = blk.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    got, got_gate, _ = blk.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(got_gate), np.asarray(want_gate))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["teacher", "dispatch", "no_adapter"])
def test_block_prologue_modes_match_unfused(monkeypatch, mode):
    """The DyT prologue kernel (adapter + router fused) reproduces the
    unfused Block in teacher, dispatch, and adapter-less modes."""
    from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.layers import Block

    tuning = TuningConfig(ffn_num=8, d_model=128,
                          ffn_adapt=mode != "no_adapter")
    blk = Block(num_heads=2, tuning=tuning,
                select_cfg=SelectConfig(token_target_ratio=0.5),
                dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 19, 128), jnp.float32)
    kwargs = (dict(complete_model=True) if mode == "teacher"
              else dict(dispatch=True) if mode == "dispatch" else {})

    monkeypatch.setenv("DYT_FUSED_ATTN", "0")
    params = blk.init(jax.random.PRNGKey(3), x)["params"]
    want, want_gate, _ = blk.apply({"params": params}, x, **kwargs)

    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    got, got_gate, _ = blk.apply({"params": params}, x, **kwargs)
    if want_gate is not None:
        np.testing.assert_allclose(np.asarray(got_gate),
                                   np.asarray(want_gate), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernels_partition_over_data_mesh(monkeypatch):
    """The serving kernels SPMD-partition along the batch sharding: no
    all-gathers are introduced and outputs stay batch-sharded (pallas_call
    alone would force replication under pjit)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from dynamic_tuning_tpu.ops.mha_serving import mha_serving_fused

    devs = np.array(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs, ("data",))
    qkv = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (16, 17, 384), jnp.float32),
        NamedSharding(mesh, P("data")))
    f = jax.jit(lambda q: mha_serving_fused(q, heads=2, interpret=True))
    out = f(qkv)
    assert out.sharding.spec == P("data")
    txt = f.lower(qkv).compile().as_text()
    assert txt.count("all-gather") == 0
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(mha_serving_fused(np.asarray(qkv), heads=2,
                                     interpret=True)),
        rtol=2e-5, atol=2e-5)


def test_qkv_packing_order():
    """The kernel's lane banding must match reshape(B,N,3,H,hd) packing."""
    B, N, H, hd = 1, 7, 2, 64
    C = H * hd
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, N, 3 * C), jnp.float32)
    q, k, v = jnp.moveaxis(
        qkv.reshape(B, N, 3, H, hd), 2, 0).transpose(0, 1, 3, 2, 4)
    want = mha_serving_reference(q, k, v)          # [B, H, N, hd]
    want = want.transpose(0, 2, 1, 3).reshape(B, N, C)
    got = mha_serving_fused(qkv, heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["student", "teacher", "dispatch"])
def test_block_moe_prologue_matches_unfused(monkeypatch, mode):
    """The MoE prologue kernel (stacked-expert mixture + router head fused,
    ops/mha_serving.py::dyt_prologue_serving_moe) reproduces the unfused
    Block's MoEAdapter module path, with an identical param tree.  Params
    are perturbed off init (router/up kernels are zeros-init, which would
    make the adapter output trivially 0)."""
    from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.layers import Block

    tuning = TuningConfig(ffn_num=8, d_model=128, moe_experts=4,
                          moe_router_tau=1.0)
    blk = Block(num_heads=2, tuning=tuning,
                select_cfg=SelectConfig(token_target_ratio=0.5),
                dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 19, 128), jnp.float32)
    kwargs = (dict(complete_model=True) if mode == "teacher"
              else dict(dispatch=True) if mode == "dispatch" else {})

    monkeypatch.setenv("DYT_FUSED_ATTN", "0")
    params = blk.init(jax.random.PRNGKey(5), x)["params"]
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(6), len(leaves))
    params = jax.tree_util.tree_unflatten(
        tree, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
               for l, k in zip(leaves, keys)])
    want, want_gate, _ = blk.apply({"params": params}, x, **kwargs)

    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    params_fused = blk.init(jax.random.PRNGKey(5), x)["params"]
    assert (jax.tree_util.tree_structure(params_fused)
            == jax.tree_util.tree_structure(params))
    got, got_gate, _ = blk.apply({"params": params}, x, **kwargs)
    if want_gate is not None:
        np.testing.assert_allclose(np.asarray(got_gate),
                                   np.asarray(want_gate), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
