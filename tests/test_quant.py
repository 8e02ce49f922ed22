"""Int8 (W8A8) serving path: kernel parity, quantization error bounds,
model-level drift, and train-path invariance (ops/quant.py).

The reference has no quantized path; these tests pin the TPU-native int8
extension against its own jnp reference arithmetic and against the fp
serving path / torch golden fixture.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.ops.quant import (attention_sublayer_serving_q8,
                                          dyt_prologue_serving_q8,
                                          q8_ln_mlp, q8_ln_mlp_reference,
                                          quantize_weight)
from dynamic_tuning_tpu.ops.mha_serving import (attention_sublayer_reference,
                                                dyt_prologue_serving)


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 384)) * 0.05
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 384)
    deq = q.astype(jnp.float32) * s
    # symmetric per-channel: error bounded by half a quant step per channel
    step = np.asarray(s)[0]
    err = np.abs(np.asarray(deq) - np.asarray(w, np.float32))
    assert (err <= step / 2 + 1e-7).all()


def test_quantize_weight_zero_channel():
    w = jnp.zeros((8, 4))
    q, s = quantize_weight(w)
    assert (np.asarray(q) == 0).all() and (np.asarray(s) == 0).all()


def test_q8_mlp_kernel_matches_reference():
    k = jax.random.PRNGKey(1)
    B, R, C, H = 2, 99, 256, 1024          # odd rows exercise the pad path
    x = jax.random.normal(k, (B, R, C), jnp.bfloat16)
    g, b = jnp.ones(C), jnp.zeros(C)
    w1 = jax.random.normal(k, (C, H)) * 0.03
    b1 = jnp.zeros(H)
    w2 = jax.random.normal(k, (H, C)) * 0.03
    b2 = jnp.zeros(C)
    out_k = q8_ln_mlp(x, g, b, w1, b1, w2, b2, interpret=True)
    out_r = q8_ln_mlp_reference(x, g, b, w1, b1, w2, b2)
    np.testing.assert_array_equal(np.asarray(out_k, np.float32),
                                  np.asarray(out_r, np.float32))


def test_q8_mlp_close_to_fp32():
    k = jax.random.PRNGKey(2)
    B, R, C, H = 2, 64, 256, 1024
    x = jax.random.normal(k, (B, R, C), jnp.bfloat16)
    g, b = jnp.ones(C), jnp.zeros(C)
    w1 = jax.random.normal(k, (C, H)) * 0.03
    b1 = jnp.zeros(H)
    w2 = jax.random.normal(k, (H, C)) * 0.03
    b2 = jnp.zeros(C)
    out = np.asarray(q8_ln_mlp(x, g, b, w1, b1, w2, b2, interpret=True),
                     np.float32)
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ln = (xf - mu) / np.sqrt(var + 1e-6)
    h = np.asarray(jax.nn.gelu(jnp.asarray(ln @ np.asarray(w1) + b1),
                               approximate=False))
    want = h @ np.asarray(w2) + np.asarray(b2)
    rel = np.abs(out - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.05, rel


def _sublayer_args(key, N=197, C=256, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (2, N, C), dtype)
    g, b = jnp.ones(C), jnp.zeros(C)
    wqkv = jax.random.normal(ks[1], (C, 3 * C), dtype) * 0.05
    bqkv = jnp.zeros(3 * C)
    wproj = jax.random.normal(ks[2], (C, C), dtype) * 0.05
    bproj = jnp.zeros(C)
    return x, g, b, wqkv, bqkv, wproj, bproj


def test_q8_sublayer_close_to_fp():
    x, g, b, wqkv, bqkv, wproj, bproj = _sublayer_args(jax.random.PRNGKey(3))
    out_q = attention_sublayer_serving_q8(x, g, b, wqkv, bqkv, wproj, bproj,
                                          heads=4, interpret=True)
    out_f = attention_sublayer_reference(x, g, b, wqkv, bqkv, wproj, bproj,
                                         heads=4)
    d = np.abs(np.asarray(out_q, np.float32) - np.asarray(out_f, np.float32))
    scale = np.abs(np.asarray(out_f, np.float32)).mean()
    assert d.mean() / scale < 0.01, d.mean() / scale


def test_q8_prologue_matches_bf16_prologue_contract():
    key = jax.random.PRNGKey(4)
    x, g, b, wqkv, bqkv, wproj, bproj = _sublayer_args(key)
    C, ffn = 256, 16
    wd = jax.random.normal(key, (C, ffn), jnp.bfloat16) * 0.05
    bd = jnp.zeros(ffn)
    wu = jax.random.normal(key, (ffn, C), jnp.bfloat16) * 0.05
    bu = jnp.zeros(C)
    wsel = jax.random.normal(key, (C, 1)) * 0.05
    bsel = jnp.zeros(1)
    a_bf = dyt_prologue_serving(x, g, b, wqkv, bqkv, wproj, bproj,
                                wd, bd, wu, bu, 0.1, wsel, bsel,
                                heads=4, interpret=True)
    a_q8 = dyt_prologue_serving_q8(x, g, b, wqkv, bqkv, wproj, bproj,
                                   wd, bd, wu, bu, 0.1, wsel, bsel,
                                   heads=4, interpret=True)
    assert len(a_bf) == len(a_q8) == 3
    for name, u, v in zip(("x_mid", "adapt", "sel"), a_bf, a_q8):
        u = np.asarray(u, np.float32)
        v = np.asarray(v, np.float32)
        rel = np.abs(u - v).mean() / (np.abs(u).mean() + 1e-9)
        assert rel < 0.02, (name, rel)


def test_q8_moe_prologue_matches_bf16_moe_prologue_contract():
    """The int8 MoE prologue (ops/quant.py::dyt_prologue_serving_q8_moe)
    returns the same (x_mid, adapt, sel) contract as the bf16 MoE prologue
    with drift bounded by the qkv/proj int8 rounding (the mixture itself is
    identical arithmetic — the shared moe_adapter_rows helper)."""
    from dynamic_tuning_tpu.ops.mha_serving import dyt_prologue_serving_moe
    from dynamic_tuning_tpu.ops.quant import dyt_prologue_serving_q8_moe

    key = jax.random.PRNGKey(6)
    x, g, b, wqkv, bqkv, wproj, bproj = _sublayer_args(key)
    C, E, bn = 256, 4, 16
    ks = jax.random.split(key, 5)
    wrt = jax.random.normal(ks[0], (C, E)) * 0.05
    down_k = jax.random.normal(ks[1], (E, C, bn), jnp.bfloat16) * 0.05
    down_b = jnp.zeros((E, bn))
    up_k = jax.random.normal(ks[2], (E, bn, C), jnp.bfloat16) * 0.05
    up_b = jax.random.normal(ks[3], (E, C)) * 0.01
    wsel = jax.random.normal(ks[4], (C, 1)) * 0.05
    bsel = jnp.zeros(1)
    a_bf = dyt_prologue_serving_moe(
        x, g, b, wqkv, bqkv, wproj, bproj, wrt, down_k, down_b, up_k, up_b,
        0.1, wsel, bsel, heads=4, tau=1.0, interpret=True)
    a_q8 = dyt_prologue_serving_q8_moe(
        x, g, b, wqkv, bqkv, wproj, bproj, wrt, down_k, down_b, up_k, up_b,
        0.1, wsel, bsel, heads=4, tau=1.0, interpret=True)
    assert len(a_bf) == len(a_q8) == 3
    for name, u, v in zip(("x_mid", "adapt", "sel"), a_bf, a_q8):
        u = np.asarray(u, np.float32)
        v = np.asarray(v, np.float32)
        rel = np.abs(u - v).mean() / (np.abs(u).mean() + 1e-9)
        assert rel < 0.02, (name, rel)


def test_q8_moe_prologue_partitions_over_data_mesh():
    """dyt_prologue_serving_q8_moe SPMD-partitions along the batch sharding
    with no induced collectives (same _batch_partitioned machinery as the
    plain q8 prologue — this pins the new kernel's 17-arg wiring)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from dynamic_tuning_tpu.ops.quant import dyt_prologue_serving_q8_moe

    devs = np.asarray(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs, ("data",))
    key = jax.random.PRNGKey(7)
    x, g, b, wqkv, bqkv, wproj, bproj = _sublayer_args(
        key, N=128)  # grid-tile row count so shards need no padding
    B = int(len(devs))
    x = jnp.tile(x[:1], (B, 1, 1))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    C, E, bn = 256, 4, 16
    ks = jax.random.split(key, 4)
    wrt = jax.random.normal(ks[0], (C, E)) * 0.05
    down_k = jax.random.normal(ks[1], (E, C, bn), jnp.bfloat16) * 0.05
    up_k = jax.random.normal(ks[2], (E, bn, C), jnp.bfloat16) * 0.05
    wsel = jax.random.normal(ks[3], (C, 1)) * 0.05
    f = jax.jit(lambda xx: dyt_prologue_serving_q8_moe(
        xx, g, b, wqkv, bqkv, wproj, bproj, wrt, down_k, jnp.zeros((E, bn)),
        up_k, jnp.zeros((E, C)), 0.1, wsel, jnp.zeros(1), heads=4, tau=1.0,
        interpret=True))
    outs = f(x)
    for o in outs:
        assert o.sharding.spec == P("data"), o.sharding
    txt = f.lower(x).compile().as_text()
    assert txt.count("all-gather") == 0 and txt.count("all-reduce") == 0


def test_model_int8_moe_same_tree_and_bounded_drift(monkeypatch):
    """int8 + MoE serving now runs the fused q8 MoE prologue (was the
    module-path fallback): the param tree must stay identical to the bf16
    MoE model's and logits drift stays bounded by the int8 rounding."""
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    mc = dict(img_size=32, patch_size=8, num_classes=10, embed_dim=256,
              depth=2, num_heads=4, residual_dtype="bfloat16")
    tuning = TuningConfig(ffn_num=16, moe_experts=4, moe_router_tau=1.0)
    m_bf = VisionTransformer(ModelConfig(**mc), tuning=tuning,
                             select=SelectConfig(), dtype=jnp.bfloat16)
    m_q8 = VisionTransformer(ModelConfig(**mc, quant="int8"), tuning=tuning,
                             select=SelectConfig(), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    params = m_bf.init(jax.random.PRNGKey(1), x)["params"]
    p2 = m_q8.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    # perturb off init (MoE router/up kernels are zeros-init)
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree_util.tree_unflatten(
        tree, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
               for l, k in zip(leaves, keys)])
    for mode in (dict(), dict(dispatch=True), dict(complete_model=True)):
        l_bf, _ = m_bf.apply({"params": params}, x, **mode)
        l_q8, _ = m_q8.apply({"params": params}, x, **mode)
        d = np.abs(np.asarray(l_bf) - np.asarray(l_q8)).max()
        scale = np.abs(np.asarray(l_bf)).max()
        assert d < 0.05 * max(scale, 1.0), (mode, d, scale)


def test_q8_kernels_partition_over_data_mesh():
    """q8_ln_mlp SPMD-partitions on the batch axis (per-shard row counts are
    padded to the 128-row grid tile inside the shard-local impl)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs, ("data",))
    k = jax.random.PRNGKey(5)
    B, R, C, H = int(len(devs)) * 2, 13, 256, 512    # ragged per-shard rows
    x = jax.device_put(jax.random.normal(k, (B, R, C), jnp.float32),
                       NamedSharding(mesh, P("data")))
    g, b = jnp.ones(C), jnp.zeros(C)
    w1 = jax.random.normal(k, (C, H)) * 0.03
    w2 = jax.random.normal(k, (H, C)) * 0.03
    b1, b2 = jnp.zeros(H), jnp.zeros(C)
    f = jax.jit(lambda xx: q8_ln_mlp(xx, g, b, w1, b1, w2, b2,
                                     interpret=True))
    out = f(x)
    assert out.sharding.spec == P("data")
    assert f.lower(x).compile().as_text().count("all-gather") == 0
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(q8_ln_mlp(np.asarray(x), g, b, w1, b1, w2, b2,
                             interpret=True)), rtol=2e-5, atol=2e-5)


@pytest.fixture()
def tiny_pair(monkeypatch):
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    mc = dict(img_size=32, patch_size=8, num_classes=10, embed_dim=256,
              depth=2, num_heads=4, residual_dtype="bfloat16")
    m_bf = VisionTransformer(ModelConfig(**mc),
                             tuning=TuningConfig(ffn_num=16),
                             select=SelectConfig(), dtype=jnp.bfloat16)
    m_q8 = VisionTransformer(ModelConfig(**mc, quant="int8"),
                             tuning=TuningConfig(ffn_num=16),
                             select=SelectConfig(), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    params = m_bf.init(jax.random.PRNGKey(1), x)["params"]
    return m_bf, m_q8, params, x


def test_model_int8_same_param_tree_and_bounded_drift(tiny_pair):
    m_bf, m_q8, params, x = tiny_pair
    p2 = m_q8.init(jax.random.PRNGKey(1), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    for mode in (dict(), dict(dispatch=True), dict(complete_model=True)):
        l_bf, _ = m_bf.apply({"params": params}, x, **mode)
        l_q8, _ = m_q8.apply({"params": params}, x, **mode)
        d = np.abs(np.asarray(l_bf) - np.asarray(l_q8)).max()
        scale = np.abs(np.asarray(l_bf)).max()
        assert d < 0.05 * max(scale, 1.0), (mode, d, scale)


def test_model_int8_train_path_bit_identical(tiny_pair):
    """quant only touches serving: the training forward must be unchanged."""
    m_bf, m_q8, params, x = tiny_pair
    rngs = {"gate": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)}
    l_bf, _ = m_bf.apply({"params": params}, x, training=True, rngs=rngs)
    l_q8, _ = m_q8.apply({"params": params}, x, training=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(l_bf), np.asarray(l_q8))


def test_int8_against_golden_fixture(monkeypatch):
    """Int8 serving logits stay close to the torch-golden fp32 logits."""
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_vit.npz")
    data = np.load(fix)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    from dynamic_tuning_tpu.train.checkpoint import import_pretrained

    mc = ModelConfig(img_size=64, patch_size=16, embed_dim=128, depth=2,
                     num_heads=2, num_classes=10, quant="int8")
    model = VisionTransformer(mc, tuning=TuningConfig(ffn_num=8, d_model=128),
                              select=SelectConfig(), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(data["x"][:1]))["params"]
    params, _ = import_pretrained(params, sd)
    logits, _ = model.apply({"params": params}, jnp.asarray(data["x"]))
    want = data["logits_eval"]
    # int8 tolerance is necessarily looser than the fp path's 5e-4; the
    # drift budget here corresponds to <<0.1% top-1 on real evals
    np.testing.assert_allclose(np.asarray(logits), want, rtol=0.05,
                               atol=0.02 * np.abs(want).max())
    assert np.argmax(np.asarray(logits), -1).tolist() == \
        np.argmax(want, -1).tolist()


def test_q8_attn_core_close_to_fp():
    """Full-int8 core (int8_attn): k-mean-centered int8 scores + int8 AV
    stay close to the fp core."""
    x, g, b, wqkv, bqkv, wproj, bproj = _sublayer_args(jax.random.PRNGKey(9))
    out_f = attention_sublayer_reference(x, g, b, wqkv, bqkv, wproj, bproj,
                                         heads=4)
    out_q = attention_sublayer_serving_q8(x, g, b, wqkv, bqkv, wproj, bproj,
                                          heads=4, attn_q8=True,
                                          interpret=True)
    d = np.abs(np.asarray(out_q, np.float32) - np.asarray(out_f, np.float32))
    scale = np.abs(np.asarray(out_f, np.float32)).mean()
    assert d.mean() / scale < 0.02, d.mean() / scale


def test_int8_attn_against_golden_fixture(monkeypatch):
    """int8_attn keeps the golden argmax (stricter drift than int8 is not
    expected; same budget)."""
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_vit.npz")
    data = np.load(fix)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    from dynamic_tuning_tpu.train.checkpoint import import_pretrained

    mc = ModelConfig(img_size=64, patch_size=16, embed_dim=128, depth=2,
                     num_heads=2, num_classes=10, quant="int8_attn")
    model = VisionTransformer(mc, tuning=TuningConfig(ffn_num=8, d_model=128),
                              select=SelectConfig(), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(data["x"][:1]))["params"]
    params, _ = import_pretrained(params, sd)
    logits, _ = model.apply({"params": params}, jnp.asarray(data["x"]))
    want = data["logits_eval"]
    np.testing.assert_allclose(np.asarray(logits), want, rtol=0.08,
                               atol=0.03 * np.abs(want).max())
    assert np.argmax(np.asarray(logits), -1).tolist() == \
        np.argmax(want, -1).tolist()


def test_q8_dispatch_mlp_matches_unfused():
    """The fused gather+MLP+scatter kernel reproduces the unfused
    onehot_dispatch_mlp + q8_ln_mlp composition exactly (it loses on speed
    — BENCH.md — but pins the fusion-boundary experiment)."""
    from dynamic_tuning_tpu.ops.dispatch import onehot_dispatch_mlp
    from dynamic_tuning_tpu.ops.quant import q8_dispatch_mlp

    k = jax.random.PRNGKey(11)
    B, N, C, K = 2, 33, 256, 17
    x = jax.random.normal(k, (B, N, C), jnp.bfloat16)
    scores = jax.random.uniform(k, (B, N))
    g, b = jnp.ones(C), jnp.zeros(C)
    w1 = jax.random.normal(k, (C, 4 * C)) * 0.02
    b1 = jnp.zeros(4 * C)
    w2 = jax.random.normal(k, (4 * C, C)) * 0.02
    b2 = jnp.zeros(C)
    want, gate_w = onehot_dispatch_mlp(
        x, scores, K,
        lambda r: q8_ln_mlp(r, g, b, w1, b1, w2, b2, interpret=True))
    got, gate_g = q8_dispatch_mlp(x, scores, g, b, w1, b1, w2, b2,
                                  capacity=K, interpret=True)
    np.testing.assert_array_equal(np.asarray(gate_g), np.asarray(gate_w))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
