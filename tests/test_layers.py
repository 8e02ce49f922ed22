"""Unit tests for Adapter / TokenSelect / Block (reference dynamic_adapter.py,
vision_transformer_IN21K.py:88-185)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import Adapter, Block, MoEAdapter, TokenSelect


def test_adapter_lora_init_outputs_zero():
    """'lora' init zeroes up_proj -> adapter output must be exactly 0 at init
    (reference dynamic_adapter.py:112-117)."""
    cfg = TuningConfig(ffn_num=8, d_model=64)
    ad = Adapter(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 64))
    params = ad.init(jax.random.PRNGKey(1), x)
    out = ad.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # down kernel is kaiming-uniform, bounded by 1/sqrt(fan_in)
    k = params["params"]["down_proj"]["kernel"]
    assert float(jnp.abs(k).max()) <= 1.0 / np.sqrt(64) + 1e-6
    assert float(jnp.abs(k).max()) > 0.0


def test_adapter_scale_applied():
    cfg = TuningConfig(ffn_num=8, d_model=64, ffn_adapter_scalar="0.1", dropout=0.0)
    ad = Adapter(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 64))
    params = ad.init(jax.random.PRNGKey(1), x)
    # overwrite up kernel so output is nonzero
    params = jax.tree_util.tree_map(lambda p: p, params)
    up = jax.random.normal(jax.random.PRNGKey(2), (8, 64))
    p = params["params"]
    p2 = {**p, "up_proj": {**p["up_proj"], "kernel": up}}
    out1 = ad.apply({"params": p2}, x)
    cfg10 = TuningConfig(ffn_num=8, d_model=64, ffn_adapter_scalar="1.0", dropout=0.0)
    out10 = Adapter(cfg10, dtype=jnp.float32).apply({"params": p2}, x)
    np.testing.assert_allclose(np.asarray(out1), 0.1 * np.asarray(out10), rtol=1e-5)


def test_token_select_cls_always_on():
    ts = TokenSelect(tau=5.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 17, 64))
    params = ts.init(jax.random.PRNGKey(1), x, training=False)
    gate, logits = ts.apply(params, x, training=False)
    assert gate.shape == (3, 17, 1)
    assert logits.shape == (3, 16, 1)
    np.testing.assert_array_equal(np.asarray(gate[:, 0, 0]), 1.0)
    vals = np.unique(np.asarray(gate))
    assert set(vals).issubset({0.0, 1.0})


def test_token_select_training_uses_gate_rng():
    ts = TokenSelect(tau=5.0, dtype=jnp.float32)
    x = jnp.zeros((2, 17, 64))
    params = ts.init(jax.random.PRNGKey(1), x, training=False)
    g1, _ = ts.apply(params, x, training=True,
                     rngs={"gate": jax.random.PRNGKey(0)})
    g2, _ = ts.apply(params, x, training=True,
                     rngs={"gate": jax.random.PRNGKey(7)})
    # zero logits + noise -> ~50% keep, different draws differ
    assert not np.array_equal(np.asarray(g1), np.asarray(g2))
    assert 0.2 < float(g1[:, 1:].mean()) < 0.8


def _tiny_block(select=True):
    return Block(num_heads=4, select=select,
                 tuning=TuningConfig(ffn_num=8, d_model=64, dropout=0.0),
                 select_cfg=SelectConfig(), dtype=jnp.float32)


def test_block_complete_model_ignores_gate():
    blk = _tiny_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64))
    params = blk.init(jax.random.PRNGKey(1), x)
    y_complete, gate, _ = blk.apply(params, x, complete_model=True)
    assert gate is None
    y_masked, gate_m, logits_m = blk.apply(params, x, complete_model=False)
    assert gate_m.shape == (2, 17, 1)
    # eval-mode deterministic gate: tokens with gate=1 match the complete
    # output; gate=0 tokens differ by exactly the (masked) MLP contribution.
    g = np.asarray(gate_m)[..., 0]
    yc, ym = np.asarray(y_complete), np.asarray(y_masked)
    kept = g > 0.5
    np.testing.assert_allclose(ym[kept], yc[kept], rtol=1e-4, atol=1e-5)
    if (~kept).any():
        assert np.abs(ym[~kept] - yc[~kept]).max() > 0


def test_block_no_select_matches_complete():
    blk = _tiny_block(select=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 64))
    params = blk.init(jax.random.PRNGKey(1), x)
    y1, gate, logits = blk.apply(params, x, complete_model=False)
    y2, _, _ = blk.apply(params, x, complete_model=True)
    assert gate is None and logits is None
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_moe_adapter_zero_init_outputs_zero_and_shapes():
    cfg = TuningConfig(ffn_num=8, d_model=64, moe_experts=4, dropout=0.0)
    ad = MoEAdapter(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 64))
    params = ad.init(jax.random.PRNGKey(1), x)
    out = ad.apply(params, x)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # up kernels zero-init
    assert params["params"]["down_kernel"].shape == (4, 64, 8)


# --- serving softmax guard (no-max form, models/layers.py Attention) ---------

def _attn_outputs(x, scale_qk=1.0):
    """Run Attention twice on the same params: serving branch (deterministic,
    no-max softmax) and training branch (standard softmax), with the qkv
    kernel scaled to push score magnitudes."""
    from dynamic_tuning_tpu.models.layers import Attention

    attn = Attention(num_heads=4, dtype=jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)["params"]
    k = params["qkv"]["kernel"]
    params = {**params, "qkv": {**params["qkv"],
                                "kernel": k * scale_qk}}
    serving = attn.apply({"params": params}, x, deterministic=True)
    train = attn.apply({"params": params}, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    return serving, train


def test_serving_softmax_matches_standard():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 32))
    serving, train = _attn_outputs(x)
    np.testing.assert_allclose(np.asarray(serving), np.asarray(train),
                               atol=2e-5, rtol=2e-5)


def test_serving_softmax_finite_at_huge_scores():
    """Trained attention logits of 30-60 are common; the guard must keep the
    no-max form finite well past 108 (fp32 exp overflow at shift 20)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 32))
    serving, _ = _attn_outputs(x, scale_qk=200.0)
    assert np.isfinite(np.asarray(serving)).all()


def test_serving_softmax_finite_at_all_negative_scores():
    """All-row-scores << -67 underflow exp(s-20) to zero without the clamp,
    giving 0/0 NaN in the deferred normalization."""
    from dynamic_tuning_tpu.models.layers import Attention

    attn = Attention(num_heads=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 9, 32))
    params = attn.init(jax.random.PRNGKey(0), x)["params"]
    # zero kernel + constant bias: q = c*ones, k = -c*ones for every token,
    # so every score is exactly -c^2*sqrt(head_dim) ~ -102
    C = x.shape[-1]
    bias = np.zeros(3 * C, np.float32)
    bias[:C] = 6.0
    bias[C:2 * C] = -6.0
    params = {**params, "qkv": {"kernel": jnp.zeros_like(params["qkv"]["kernel"]),
                                "bias": jnp.asarray(bias)}}
    out = attn.apply({"params": params}, x, deterministic=True)
    assert np.isfinite(np.asarray(out)).all()


def test_rel_pos_bias_structured_equals_index_gather():
    """_rel_pos_bias_from_table (Kronecker-structured build) must reproduce
    table[_relative_position_index] exactly — it replaces the flat N^2-index
    gather that dominated the seg forward."""
    import numpy as np
    from dynamic_tuning_tpu.models.layers import (_rel_pos_bias_from_table,
                                                  _relative_position_index)

    for wh, ww in ((4, 4), (3, 5)):
        idx, ts = _relative_position_index(wh, ww)
        table = jax.random.normal(jax.random.PRNGKey(0), (ts, 3))
        want = np.asarray(table)[np.asarray(idx)].transpose(2, 0, 1)
        got = np.asarray(_rel_pos_bias_from_table(table, wh, ww))
        np.testing.assert_array_equal(got, want)
