"""Loss-curve parity vs torch over real optimizer steps (SURVEY Phase-1
success criterion: "a few training steps reproduce loss curves").

Both frameworks run the FULL training step — student forward with
straight-through gates, teacher forward, 4-term loss (reference
engine_finetune.py:16-106), AdamW on the trainable subset
(main_image.py:249-256,285) under the per-iteration warmup+cosine schedule
(util/lr_sched.py:9-21) — from bit-identical weights and data, and the
per-step loss parts must agree to fp32 trajectory tolerance.

Noise-free contract (both sides): every dropout/drop-path rate is 0 and the
gumbel gate noise is fixed to zero (jax.random.logistic patched to zeros;
the torch mirror adds none), making the trajectory deterministic.  The
router kernel is scaled up at init so hard sigmoid>0.5 decisions carry
margin against cross-framework float noise; margins are re-asserted every
step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_train_step, model_apply_fn)
from dynamic_tuning_tpu.train.optim import (make_optimizer, partition_params,
                                            warmup_cosine_schedule)

from torch_oracle import TorchDyTTrainer

DIM, HEADS, DEPTH, FFN, CLASSES = 64, 4, 2, 8, 10
IMG, PATCH, B = 32, 8, 8
STEPS, SPE = 12, 4          # 3 "epochs" of 4 steps: warmup + cosine both hit
BASE_LR, WD = 5e-3, 0.01
SEL = SelectConfig()        # target 0.5, ratio 2.0, tau 5


def _setup():
    mc = ModelConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                     depth=DEPTH, num_heads=HEADS, num_classes=CLASSES)
    model = VisionTransformer(
        mc, tuning=TuningConfig(ffn_num=FFN, d_model=DIM, dropout=0.0),
        select=SEL, dtype=jnp.float32)
    rs = np.random.RandomState(3)
    x0 = jnp.asarray(rs.randn(B, IMG, IMG, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x0)["params"]
    # stable hard gates: push router logits away from the 0.5 boundary
    # (same trick as test_torch_parity/_build_block)
    for i in range(DEPTH):
        blk = params[f"blocks_{i}"]
        blk["mlp_token_select"]["mlp_head"]["kernel"] = (
            blk["mlp_token_select"]["mlp_head"]["kernel"] * 60.0)
        # exercise the adapter path: the lora zero-init up_proj would keep
        # the bottleneck dark for the first steps otherwise
        blk["adaptmlp"]["up_proj"]["kernel"] = jnp.asarray(
            rs.randn(FFN, DIM).astype(np.float32) * 0.05)
    data = [(rs.randn(B, IMG, IMG, 3).astype(np.float32),
             rs.randint(0, CLASSES, (B,)).astype(np.int64))
            for _ in range(STEPS)]
    return model, params, data


def test_train_loss_curve_matches_torch(monkeypatch):
    model, params, data = _setup()

    # --- JAX side: the real engine, gate noise pinned to zero -------------
    monkeypatch.setattr(jax.random, "logistic",
                        lambda key, shape=(), dtype=jnp.float32:
                        jnp.zeros(shape, dtype))
    trainable, frozen = partition_params(params)
    tx = make_optimizer(BASE_LR, epochs=STEPS / SPE, warmup_epochs=1.0,
                        steps_per_epoch=SPE, weight_decay=WD)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(7))
    step = make_train_step(model_apply_fn(model), tx, SEL)
    jax_parts = []
    for x, y in data:
        state, parts = step(state, jnp.asarray(x), jnp.asarray(y))
        jax_parts.append({k: float(v) for k, v in parts.items()})

    # --- torch mirror ------------------------------------------------------
    from flax import traverse_util

    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}
    mirror = TorchDyTTrainer(flat, heads=HEADS, depth=DEPTH, patch=PATCH,
                             tau=SEL.tau, target_ratio=SEL.token_target_ratio,
                             token_loss_ratio=SEL.token_loss_ratio,
                             weight_decay=WD)
    sched = warmup_cosine_schedule(BASE_LR, 0.0, STEPS / SPE, 1.0, SPE)
    torch_parts = [mirror.step(x, y, float(sched(i)))
                   for i, (x, y) in enumerate(data)]

    # --- per-step trajectory agreement ------------------------------------
    for i, (jp, tp) in enumerate(zip(jax_parts, torch_parts)):
        assert jp["keep_ratio"] == pytest.approx(tp["keep_ratio"], abs=1e-6), \
            f"step {i}: gate sets diverged"
        for key in ("loss", "base_loss", "token_loss", "teacher_loss",
                    "distillation_loss"):
            assert jp[key] == pytest.approx(tp[key], rel=2e-4, abs=2e-5), \
                f"step {i} {key}: jax {jp[key]} torch {tp[key]}"

    # the trajectory moved (this is a real training run, not a fixed point)
    assert abs(jax_parts[-1]["loss"] - jax_parts[0]["loss"]) > 1e-3

    # --- final trainable params agree -------------------------------------
    for path, v in state.trainable.items():
        tv = mirror.p[path].detach().numpy()
        np.testing.assert_allclose(np.asarray(v), tv, rtol=1e-3, atol=2e-5,
                                   err_msg=str(path))


def test_fulltune_loss_curve_matches_torch(monkeypatch):
    """--fulltune (reference main_image.py:254) trains the WHOLE backbone:
    the parity must hold with gradients flowing through the frozen-by-
    default parts too (patch conv, attention, LNs, pos/cls embeddings) —
    much wider gradient coverage than the adapter/router/head-only test."""
    model, params, data = _setup()
    data = data[:8]

    monkeypatch.setattr(jax.random, "logistic",
                        lambda key, shape=(), dtype=jnp.float32:
                        jnp.zeros(shape, dtype))
    trainable, frozen = partition_params(params, predicate=lambda p: True)
    assert not frozen
    tx = make_optimizer(BASE_LR, epochs=len(data) / SPE, warmup_epochs=1.0,
                        steps_per_epoch=SPE, weight_decay=WD)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(7))
    step = make_train_step(model_apply_fn(model), tx, SEL)
    jax_parts = []
    for x, y in data:
        state, parts = step(state, jnp.asarray(x), jnp.asarray(y))
        jax_parts.append({k: float(v) for k, v in parts.items()})

    from flax import traverse_util

    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}
    mirror = TorchDyTTrainer(flat, heads=HEADS, depth=DEPTH, patch=PATCH,
                             tau=SEL.tau, target_ratio=SEL.token_target_ratio,
                             token_loss_ratio=SEL.token_loss_ratio,
                             weight_decay=WD, fulltune=True)
    sched = warmup_cosine_schedule(BASE_LR, 0.0, len(data) / SPE, 1.0, SPE)
    torch_parts = [mirror.step(x, y, float(sched(i)))
                   for i, (x, y) in enumerate(data)]

    for i, (jp, tp) in enumerate(zip(jax_parts, torch_parts)):
        assert jp["keep_ratio"] == pytest.approx(tp["keep_ratio"], abs=1e-6), \
            f"step {i}: gate sets diverged"
        for key in ("loss", "base_loss", "token_loss", "teacher_loss",
                    "distillation_loss"):
            assert jp[key] == pytest.approx(tp[key], rel=5e-4, abs=5e-5), \
                f"step {i} {key}: jax {jp[key]} torch {tp[key]}"

    # backbone weights actually moved and still agree cross-framework
    moved = np.abs(np.asarray(state.trainable[("blocks_0", "attn", "qkv",
                                               "kernel")])
                   - flat[("blocks_0", "attn", "qkv", "kernel")]).max()
    assert moved > 1e-5, "fulltune did not train the backbone"
    for path in [("blocks_0", "attn", "qkv", "kernel"),
                 ("patch_embed", "proj", "kernel"), ("cls_token",),
                 ("norm", "scale")]:
        np.testing.assert_allclose(
            np.asarray(state.trainable[path]),
            mirror.p[path].detach().numpy(), rtol=2e-3, atol=5e-5,
            err_msg=str(path))
