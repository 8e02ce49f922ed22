"""fast_vit_forward must agree with the flax model's eval forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.fast_inference import fast_vit_forward
from dynamic_tuning_tpu.models.vit import VisionTransformer


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    tuning = TuningConfig(ffn_num=8, d_model=64, dropout=0.0)
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=tuning, select=sel, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    # strengthen router so gates are stable across bf16-vs-fp32 noise
    for i in range(cfg.depth):
        params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] = (
            params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] * 60)
    return cfg, tuning, sel, model, params, x


def test_fast_dense_matches_flax_complete(setup):
    cfg, tuning, sel, model, params, x = setup
    ref, _ = model.apply({"params": params}, x, complete_model=True)
    got, gates = fast_vit_forward(params, x, cfg=cfg, tuning=tuning,
                                  select=sel, mode="dense", use_pallas=False)
    assert gates is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # argmax agreement where the fp32 margin is above bf16 noise (random
    # params give near-tied logits; the fast path is bf16 end-to-end)
    r = np.asarray(ref)
    top2 = np.sort(r, -1)[:, -2:]
    confident = (top2[:, 1] - top2[:, 0]) > 0.05
    np.testing.assert_array_equal(np.argmax(got, -1)[confident],
                                  np.argmax(r, -1)[confident])


def test_fast_mask_matches_flax_eval(setup):
    cfg, tuning, sel, model, params, x = setup
    ref, aux = model.apply({"params": params}, x)
    got, gates = fast_vit_forward(params, x, cfg=cfg, tuning=tuning,
                                  select=sel, mode="mask", use_pallas=False)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(ref, -1))
    # gates identical to the flax eval gate (strip CLS to compare)
    np.testing.assert_array_equal(
        np.asarray(gates[:, :, 1:]),
        np.asarray(aux["token_select"])[..., 0])


def test_fast_dispatch_matches_flax_dispatch(setup):
    cfg, tuning, sel, model, params, x = setup
    ref, aux = model.apply({"params": params}, x, dispatch=True)
    got, gates = fast_vit_forward(params, x, cfg=cfg, tuning=tuning,
                                  select=sel, mode="dispatch",
                                  use_pallas=False)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(ref, -1))
    np.testing.assert_array_equal(
        np.asarray(gates[:, :, 1:]),
        np.asarray(aux["token_select"])[..., 0])


def test_fast_pallas_interpret_matches_jnp(setup):
    cfg, tuning, sel, model, params, x = setup
    a, _ = fast_vit_forward(params, x, cfg=cfg, tuning=tuning, select=sel,
                            mode="dispatch", use_pallas=False)
    b, _ = fast_vit_forward(params, x, cfg=cfg, tuning=tuning, select=sel,
                            mode="dispatch", use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                               atol=2e-2)

def test_fast_path_honors_learnable_scalar():
    """ffn_adapter_scalar='learnable_scalar' reads the trained per-block
    scale param instead of float()-crashing (review finding)."""
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    tuning = TuningConfig(ffn_num=8, d_model=64, dropout=0.0,
                          ffn_adapter_scalar="learnable_scalar")
    sel = SelectConfig()
    model = VisionTransformer(cfg, tuning=tuning, select=sel,
                              dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    # a non-trivial trained value: wrong handling (ignoring the param)
    # would show up as a logits mismatch
    for i in range(cfg.depth):
        params[f"blocks_{i}"]["adaptmlp"]["scale"] = jnp.full((1,), 0.7)
        params[f"blocks_{i}"]["adaptmlp"]["up_proj"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(2 + i), (8, 64)) * 0.1)
        params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] = (
            params[f"blocks_{i}"]["mlp_token_select"]["mlp_head"]["kernel"] * 60)
    ref, _ = model.apply({"params": params}, x)
    got, _ = fast_vit_forward(params, x, cfg=cfg, tuning=tuning,
                              select=sel, mode="mask", use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # and the scale actually matters: zeroing it changes the output
    for i in range(cfg.depth):
        params[f"blocks_{i}"]["adaptmlp"]["scale"] = jnp.zeros((1,))
    got0, _ = fast_vit_forward(params, x, cfg=cfg, tuning=tuning,
                               select=sel, mode="mask", use_pallas=False)
    assert np.abs(np.asarray(got0) - np.asarray(got)).max() > 1e-3


def test_fast_path_rejects_unsupported_adapter_configs():
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=1, num_heads=4)
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="layernorm_option"):
        fast_vit_forward({}, x, cfg=cfg,
                         tuning=TuningConfig(ffn_num=8, d_model=64,
                                             ffn_adapter_layernorm_option="in"),
                         select=SelectConfig(), mode="dense")
    with pytest.raises(ValueError, match="MoE"):
        fast_vit_forward({}, x, cfg=cfg,
                         tuning=TuningConfig(ffn_num=8, d_model=64,
                                             moe_experts=4),
                         select=SelectConfig(), mode="dense")


def test_chunked_serving_matches_monolithic():
    """chunked_serving (the b>128 operating-envelope wrapper, BENCH.md
    round-4 batch-dip diagnosis) must be output-identical to the monolithic
    call — equal chunks, remainder tail, and None-leaf pytrees included."""
    from dynamic_tuning_tpu.models.fast_inference import chunked_serving

    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4)
    tuning = TuningConfig(ffn_num=8, d_model=64)
    sel = SelectConfig(token_target_ratio=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (10, 32, 32, 3))
    from dynamic_tuning_tpu.models.vit import VisionTransformer
    model = VisionTransformer(cfg, tuning=tuning, select=sel,
                              dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]

    def fwd(c):
        return fast_vit_forward(params, c, cfg=cfg, tuning=tuning,
                                select=sel, mode="dispatch",
                                use_pallas=False)

    ref_logits, ref_gates = fwd(x)
    for chunk in (4, 5, 16):   # remainder, divisible, degenerate (B<chunk)
        got_logits, got_gates = chunked_serving(fwd, chunk)(x)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(ref_logits), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_gates),
                                   np.asarray(ref_gates), rtol=0, atol=0)

    # dense mode returns gates=None — the None leaf must survive chunking
    def fwd_dense(c):
        return fast_vit_forward(params, c, cfg=cfg, tuning=tuning,
                                select=sel, mode="dense", use_pallas=False)

    dl, dg = chunked_serving(fwd_dense, 4)(x)
    assert dg is None and dl.shape == (10, 10)
