"""Numerical parity vs a torch oracle assembled from torch primitives.

The north star requires reference-finetuned checkpoints to reproduce logits
(BASELINE.json).  These tests build the SAME computation in torch (LayerNorm,
fused-qkv attention, GELU MLP, parallel ReLU-bottleneck adapter, deterministic
sigmoid>0.5 gate — the reference's block semantics,
vision_transformer_IN21K.py:144-165) with identical weights and check our
fp32 forward matches to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.layers import Block

D, HEADS, T, B = 64, 4, 17, 2
FFN = 8


def _np(x):
    return np.asarray(x)


def torch_block_forward(p, x, complete_model=False):
    """The DyT block computation in torch, eval mode, from flax params."""

    def lin(h, mod):  # flax kernel [in,out] -> torch [out,in]
        w = torch.tensor(_np(mod["kernel"]).T)
        b = torch.tensor(_np(mod["bias"]))
        return tF.linear(h, w, b)

    def ln(h, mod):
        return tF.layer_norm(h, (h.shape[-1],), torch.tensor(_np(mod["scale"])),
                             torch.tensor(_np(mod["bias"])), eps=1e-6)

    x = torch.tensor(_np(x))
    h = ln(x, p["norm1"])
    qkv = lin(h, p["attn"]["qkv"])                      # [B,T,3D]
    q, k, v = qkv.reshape(B, T, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
    att = tF.scaled_dot_product_attention(q, k, v)
    att = att.transpose(1, 2).reshape(B, T, D)
    x = x + lin(att, p["attn"]["proj"])

    # router: eval gate = sigmoid(logits) > 0.5, CLS forced on
    logits = lin(x[:, 1:], p["mlp_token_select"]["mlp_head"])
    gate = (torch.sigmoid(logits) > 0.5).float()
    gate = torch.cat([torch.ones(B, 1, 1), gate], dim=1)

    # parallel adapter (scale 0.1, no LN, eval -> no dropout)
    down = tF.relu(lin(x, p["adaptmlp"]["down_proj"]))
    adapt = lin(down, p["adaptmlp"]["up_proj"]) * 0.1

    h2 = ln(x, p["norm2"])
    mlp = lin(tF.gelu(lin(h2, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    if not complete_model:
        mlp = gate * mlp
    return (x + mlp + adapt).numpy(), gate.numpy()


def _build_block():
    blk = Block(num_heads=HEADS,
                tuning=TuningConfig(ffn_num=FFN, d_model=D,
                                    ffn_adapter_scalar="0.1", dropout=0.0),
                select_cfg=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    # randomize the zero-init adapter up so the adapter path is exercised
    up = jax.random.normal(jax.random.PRNGKey(2), (FFN, D)) * 0.05
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["adaptmlp"]["up_proj"]["kernel"] = up
    # push router logits away from 0 so the hard threshold is stable across
    # frameworks (no borderline 0.5 crossings from float noise)
    params["mlp_token_select"]["mlp_head"]["kernel"] = (
        params["mlp_token_select"]["mlp_head"]["kernel"] * 60.0)
    return blk, params, x


def test_block_eval_parity_with_torch():
    blk, params, x = _build_block()
    ours, gate, _ = blk.apply({"params": params}, x)
    ref, ref_gate = torch_block_forward(params, x)
    np.testing.assert_array_equal(_np(gate), ref_gate)
    assert 0.05 < ref_gate[:, 1:].mean() < 0.95  # gate non-degenerate
    np.testing.assert_allclose(_np(ours), ref, rtol=2e-4, atol=2e-5)


def test_block_complete_model_parity_with_torch():
    blk, params, x = _build_block()
    ours, _, _ = blk.apply({"params": params}, x, complete_model=True)
    ref, _ = torch_block_forward(params, x, complete_model=True)
    np.testing.assert_allclose(_np(ours), ref, rtol=2e-4, atol=2e-5)


def test_gumbel_train_matches_torch_formula():
    """Same logistic noise + tau -> identical straight-through output as the
    torch formula (dynamic_adapter.py:25-54), noise injected explicitly."""
    from dynamic_tuning_tpu.ops.gumbel import gumbel_sigmoid

    rs = np.random.RandomState(0)
    logits = rs.randn(5, 16, 1).astype(np.float32)
    tau = 5.0
    # torch formula with explicit gumbels
    g1 = rs.gumbel(size=logits.shape).astype(np.float32)
    g2 = rs.gumbel(size=logits.shape).astype(np.float32)
    t_soft = torch.sigmoid(torch.tensor((logits + g1 - g2) / tau))
    t_hard = (t_soft > 0.5).float()
    # ours with the same noise: monkeypatch the logistic draw
    noise = jnp.asarray(g1 - g2)
    orig = jax.random.logistic
    try:
        jax.random.logistic = lambda *a, **k: noise
        ours = gumbel_sigmoid(jnp.asarray(logits), jax.random.PRNGKey(0),
                              tau=tau, hard=True)
    finally:
        jax.random.logistic = orig
    np.testing.assert_allclose(_np(ours), t_hard.numpy(), atol=1e-6)
