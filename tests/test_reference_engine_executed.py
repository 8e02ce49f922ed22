"""Executed-loop parity: the reference's OWN train/eval engine as oracle.

test_reference_executed_parity.py executes the reference's models, AdaLoss,
and lr schedule but composes them in a test-local harness (ReferenceTrainer,
mirroring engine_finetune.py:45-77).  These tests remove that last layer of
transcription: the torch side here calls ``engine_finetune.train_one_epoch``
/ ``evaluate`` / ``evaluate_video`` (/root/reference/engine_finetune.py:16,
209, 282) THEMSELVES, driving ``misc.MetricLogger`` +
``NativeScalerWithGradNormCount`` and ``util/metrics.py`` unmodified, so the
epoch-level protocol — per-iteration lr scheduling at ``i/len + epoch``,
loss composition, meter averaging, concat-then-metric eval, multi-view logit
averaging — is pinned against reference code that actually ran.

Environment-only adaptations (no reference edits):
  * ``torch.cuda.synchronize`` (engine_finetune.py:84) monkeypatched to a
    no-op — it raises on a CPU-only build;
  * ``torch.cuda.amp.autocast``/``GradScaler`` self-disable on CPU (fp32
    compute, identity scaling), matching our fp32 test dtype;
  * gumbel noise and adapter dropout pinned to zero on both frameworks —
    the same noise-free contract every cross-framework train test uses.
"""

import logging
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.checkpoint import import_pretrained

from reference_oracle import (
    build_reference_image_model,
    build_reference_video_model,
    flax_to_video_sd,
    load_reference_engine,
    load_reference_modules,
    reference_available,
    zero_adapter_dropout,
    zero_gumbel_noise,
)
from torch_oracle import make_vit_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

TDIM, THEADS, TDEPTH, TFFN, TCLASSES = 64, 4, 2, 8, 10
TIMG, TPATCH, TB = 32, 8, 8
SEL = SelectConfig()
LOGGER = logging.getLogger("reference-engine-oracle")


def _reference_image_setup(rs, *, router_scale=60.0, train=False):
    """Reference tiny ViT + our flax twin, sharing one synthetic state dict."""
    sd = make_vit_state_dict(rs, depth=TDEPTH, dim=TDIM, ffn=TFFN,
                             classes=TCLASSES, img=TIMG, patch=TPATCH,
                             router_scale=router_scale)
    ref = build_reference_image_model(img=TIMG, patch=TPATCH, dim=TDIM,
                                      depth=TDEPTH, heads=THEADS,
                                      classes=TCLASSES, ffn=TFFN)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected
    zero_adapter_dropout(ref)

    mc = ModelConfig(img_size=TIMG, patch_size=TPATCH, embed_dim=TDIM,
                     depth=TDEPTH, num_heads=THEADS, num_classes=TCLASSES)
    model = VisionTransformer(
        mc, tuning=TuningConfig(ffn_num=TFFN, d_model=TDIM, dropout=0.0),
        select=SEL, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, TIMG, TIMG, 3)))["params"]
    params, miss = import_pretrained(params, sd)
    assert miss == []
    return ref, model, params


# ---------------------------------------------------------------------------
# train_one_epoch, executed
# ---------------------------------------------------------------------------

def test_train_one_epoch_executed_vs_jax_engine(monkeypatch):
    """engine_finetune.train_one_epoch (the reference's real epoch loop:
    per-iteration lr_sched at ``i/len + epoch``, student+teacher+KL loss
    composition, NativeScaler backward/step, MetricLogger global averages)
    vs our jitted train engine averaged with OUR MetricLogger, key by key."""
    from dynamic_tuning_tpu.train.engine import (create_train_state,
                                                 make_train_step,
                                                 model_apply_fn)
    from dynamic_tuning_tpu.train.optim import (make_optimizer,
                                                partition_params,
                                                warmup_cosine_schedule)
    from dynamic_tuning_tpu.utils.meters import MetricLogger

    STEPS, EPOCHS, WARMUP = 8, 2.0, 0.5   # warmup ends mid-epoch: both
    BASE_LR, WD = 5e-3, 0.01              # lr regimes exercised in-loop

    rs = np.random.RandomState(9)
    ref, model, params = _reference_image_setup(rs)
    data = [(rs.randn(TB, TIMG, TIMG, 3).astype(np.float32),
             rs.randint(0, TCLASSES, (TB,)).astype(np.int64))
            for _ in range(STEPS)]

    # --- JAX side: real jitted engine + our MetricLogger epoch averaging --
    monkeypatch.setattr(jax.random, "logistic",
                        lambda key, shape=(), dtype=jnp.float32:
                        jnp.zeros(shape, dtype))
    trainable, frozen = partition_params(params)
    tx = make_optimizer(BASE_LR, epochs=EPOCHS, warmup_epochs=WARMUP,
                        steps_per_epoch=STEPS, weight_decay=WD)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(7))
    step = make_train_step(model_apply_fn(model), tx, SEL)
    sched = warmup_cosine_schedule(BASE_LR, 0.0, EPOCHS, WARMUP, STEPS)
    ml = MetricLogger(logger=LOGGER)
    for i, (x, y) in enumerate(data):
        state, parts = step(state, jnp.asarray(x), jnp.asarray(y))
        ml.update(lr=float(sched(i)),
                  **{k: float(v) for k, v in parts.items()
                     if k != "keep_ratio"})
    ours = {k: m.global_avg for k, m in ml.meters.items()}

    # --- torch side: the reference's OWN loop, executed -------------------
    zero_gumbel_noise(monkeypatch)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    mods = load_reference_modules()
    eng = load_reference_engine()
    crit = mods["losses"].AdaLoss(
        base_criterion=torch.nn.CrossEntropyLoss(),
        token_target_ratio=SEL.token_target_ratio,
        token_loss_ratio=SEL.token_loss_ratio,
        token_minimal=0.0, token_minimal_weight=0.0)
    # freeze rule of main_image.py:249-256 + its AdamW (:285)
    for name, p in ref.named_parameters():
        p.requires_grad = ("adaptmlp" in name or "mlp_token_select" in name
                           or name.startswith("head."))
    opt = torch.optim.AdamW(
        [p for _, p in ref.named_parameters() if p.requires_grad],
        lr=BASE_LR, weight_decay=WD)
    loader = [(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(),
               torch.from_numpy(y)) for x, y in data]
    args = SimpleNamespace(accum_iter=1, lr=BASE_LR, min_lr=0.0,
                           warmup_epochs=WARMUP, epochs=EPOCHS)
    stats = eng["engine"].train_one_epoch(
        ref, crit, loader, opt, torch.device("cpu"), epoch=0,
        loss_scaler=eng["misc"].NativeScalerWithGradNormCount(),
        max_norm=None, mixup_fn=None, log_writer=None, args=args,
        logger=LOGGER)

    # --- epoch-averaged stats agree, key by key ---------------------------
    for key in ("loss", "base_loss", "token_loss", "teacher_loss",
                "distillation_loss"):
        assert ours[key] == pytest.approx(stats[key], rel=2e-4, abs=2e-5), \
            f"{key}: ours {ours[key]} reference-executed {stats[key]}"
    # lr meter: our optax schedule vs executed lr_sched.adjust_learning_rate
    assert ours["lr"] == pytest.approx(stats["lr"], rel=1e-6)
    # sanity: the epoch actually moved (same guard as the 12-step test)
    assert stats["lr"] > 0 and ours["loss"] > 0


def test_train_one_epoch_executed_accum_iter(monkeypatch):
    """--accum_iter=2 loop semantics, reference loop executed: lr adjusted
    only when ``i % accum == 0`` (engine_finetune.py:38-39), loss divided by
    accum before backward (:73), optimizer stepped every accum-th micro-batch
    (:74-79) — vs our optax.MultiSteps wrapper (train/optim.py
    with_grad_accumulation) with the schedule advancing per APPLIED step.
    Pins the averaged meters AND the final trainable params."""
    from dynamic_tuning_tpu.train.engine import (create_train_state,
                                                 make_train_step,
                                                 model_apply_fn)
    from dynamic_tuning_tpu.train.optim import (make_optimizer,
                                                partition_params,
                                                warmup_cosine_schedule,
                                                with_grad_accumulation)
    from dynamic_tuning_tpu.utils.meters import MetricLogger

    STEPS, ACC, EPOCHS, WARMUP = 8, 2, 2.0, 0.5
    BASE_LR, WD = 5e-3, 0.01
    APPLIED = STEPS // ACC  # schedule steps per epoch after accumulation

    rs = np.random.RandomState(31)
    ref, model, params = _reference_image_setup(rs)
    data = [(rs.randn(TB, TIMG, TIMG, 3).astype(np.float32),
             rs.randint(0, TCLASSES, (TB,)).astype(np.int64))
            for _ in range(STEPS)]

    # --- JAX side ----------------------------------------------------------
    monkeypatch.setattr(jax.random, "logistic",
                        lambda key, shape=(), dtype=jnp.float32:
                        jnp.zeros(shape, dtype))
    trainable, frozen = partition_params(params)
    tx = with_grad_accumulation(
        make_optimizer(BASE_LR, epochs=EPOCHS, warmup_epochs=WARMUP,
                       steps_per_epoch=APPLIED, weight_decay=WD), ACC)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(7))
    step = make_train_step(model_apply_fn(model), tx, SEL)
    sched = warmup_cosine_schedule(BASE_LR, 0.0, EPOCHS, WARMUP, APPLIED)
    ml = MetricLogger(logger=LOGGER)
    for i, (x, y) in enumerate(data):
        state, parts = step(state, jnp.asarray(x), jnp.asarray(y))
        li = float(parts["loss"])
        ml.update(**{k: float(v) for k, v in parts.items()
                     if k != "keep_ratio"})
        # mirror the reference's meter protocol exactly: the 'loss' meter is
        # updated a SECOND time each micro-step with loss/accum_iter
        # (engine_finetune.py:92 after :73's division), and 'lr' once with
        # the last-adjusted value (stale on odd micro-steps)
        ml.update(loss=li / ACC, lr=float(sched(i // ACC)))
    ours = {k: m.global_avg for k, m in ml.meters.items()}

    # --- torch side: the reference's OWN loop, accum_iter=2 ----------------
    zero_gumbel_noise(monkeypatch)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    mods = load_reference_modules()
    eng = load_reference_engine()
    crit = mods["losses"].AdaLoss(
        base_criterion=torch.nn.CrossEntropyLoss(),
        token_target_ratio=SEL.token_target_ratio,
        token_loss_ratio=SEL.token_loss_ratio,
        token_minimal=0.0, token_minimal_weight=0.0)
    for name, p in ref.named_parameters():
        p.requires_grad = ("adaptmlp" in name or "mlp_token_select" in name
                           or name.startswith("head."))
    opt = torch.optim.AdamW(
        [p for _, p in ref.named_parameters() if p.requires_grad],
        lr=BASE_LR, weight_decay=WD)
    loader = [(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(),
               torch.from_numpy(y)) for x, y in data]
    args = SimpleNamespace(accum_iter=ACC, lr=BASE_LR, min_lr=0.0,
                           warmup_epochs=WARMUP, epochs=EPOCHS)
    stats = eng["engine"].train_one_epoch(
        ref, crit, loader, opt, torch.device("cpu"), epoch=0,
        loss_scaler=eng["misc"].NativeScalerWithGradNormCount(),
        max_norm=None, mixup_fn=None, log_writer=None, args=args,
        logger=LOGGER)

    for key in ("loss", "base_loss", "token_loss", "teacher_loss",
                "distillation_loss"):
        assert ours[key] == pytest.approx(stats[key], rel=2e-4, abs=2e-5), \
            f"{key}: ours {ours[key]} reference-executed {stats[key]}"
    assert ours["lr"] == pytest.approx(stats["lr"], rel=1e-6)

    # final trainable params: grad-mean accumulation + step timing agree
    ref_sd = ref.state_dict()
    for path, v in state.trainable.items():
        if path[0].startswith("blocks_"):
            idx = path[0].split("_")[1]
            tail = ".".join(path[1:-1])
            name = (f"blocks.{idx}.{tail}."
                    f"{'weight' if path[-1] == 'kernel' else 'bias'}")
        elif path[0] == "head":
            name = f"head.{'weight' if path[-1] == 'kernel' else 'bias'}"
        else:
            raise AssertionError(path)
        got_p = np.asarray(v)
        if path[-1] == "kernel":
            got_p = got_p.T
        np.testing.assert_allclose(got_p, ref_sd[name].numpy(),
                                   rtol=1e-3, atol=2e-5, err_msg=name)


# ---------------------------------------------------------------------------
# evaluate, executed
# ---------------------------------------------------------------------------

def _eval_batches(rs, nbatches=4):
    return [(np.clip(rs.randn(TB, TIMG, TIMG, 3), -2.6, 2.6)
             .astype(np.float32),
             rs.randint(0, TCLASSES, (TB,)).astype(np.int64))
            for _ in range(nbatches)]


def test_evaluate_executed_both_metric_modes():
    """engine_finetune.evaluate executed (concat-all-batches-then-metric
    protocol, util/metrics.py accuracy / mean_per_class_accuracy) vs our
    eval step + utils/metrics over the same batches, both metric modes."""
    from dynamic_tuning_tpu.train.engine import make_eval_step, model_apply_fn
    from dynamic_tuning_tpu.train.optim import partition_params
    from dynamic_tuning_tpu.utils.metrics import (mean_per_class_accuracy,
                                                  topk_accuracy)

    rs = np.random.RandomState(17)
    ref, model, params = _reference_image_setup(rs)
    ref.eval()
    batches = _eval_batches(rs)

    # --- ours: real eval step, reference eval protocol (concat, then once)
    trainable, frozen = partition_params(params)
    eval_step = make_eval_step(model_apply_fn(model))
    logits = np.concatenate([np.asarray(
        eval_step(trainable, frozen, jnp.asarray(x))[0]) for x, _ in batches])
    labels = np.concatenate([y for _, y in batches])
    our_acc1 = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                             (1,))[0]
    our_mpca = mean_per_class_accuracy(jnp.asarray(logits), labels, TCLASSES)

    # --- reference loop executed, both metric modes ------------------------
    eng = load_reference_engine()
    loader = [(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(),
               torch.from_numpy(y)) for x, y in batches]
    status = {}
    for mode in ("accuracy", "mean_per_class_acc"):
        args = SimpleNamespace(metric=mode, nb_classes=TCLASSES)
        with torch.no_grad():
            status[mode] = eng["engine"].evaluate(
                loader, ref, torch.device("cpu"), LOGGER,
                base_flops=None, flops_dict=None, args=args)["metric"]

    # tiny-net logits differ by <1e-4 cross-framework (pinned elsewhere);
    # identical argmax/top-1 sets make the metrics agree to fp32 roundoff
    assert our_acc1 == pytest.approx(status["accuracy"], abs=1e-4)
    assert our_mpca == pytest.approx(status["mean_per_class_acc"], abs=1e-4)

    # and the metric FUNCTIONS pinned on identical logits (executed
    # util/metrics.py vs our transcription), including acc5 + the
    # clamp(gt,min=1) zero-sample-class rule
    import sys

    refm = sys.modules["util.metrics"]
    tl, ty = torch.from_numpy(logits), torch.from_numpy(labels)
    want1, want5 = refm.accuracy(tl, ty, topk=(1, 5))
    got1, got5 = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                               (1, 5))
    assert got1 == pytest.approx(want1.item(), abs=1e-5)
    assert got5 == pytest.approx(want5.item(), abs=1e-5)
    want_mpca = refm.mean_per_class_accuracy(tl, ty, TCLASSES)
    assert our_mpca == pytest.approx(want_mpca.item(), abs=1e-5)


# ---------------------------------------------------------------------------
# evaluate_video, executed (multi-view protocol)
# ---------------------------------------------------------------------------

T_FRAMES, VCLASSES = 8, 10


def _reference_video_setup(rs, *, dropout=None):
    """Reference tiny video ViT + our flax twin from one flax init, with the
    same liveness randomization the full-shape video parity test uses:
    router margin, live adapters, attentive-pool query + qv biases."""
    from flax import traverse_util

    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer

    cfg = ModelConfig(img_size=TIMG, patch_size=TPATCH, embed_dim=TDIM,
                      depth=TDEPTH, num_heads=THEADS, num_classes=VCLASSES,
                      num_frames=T_FRAMES)
    tuning = (TuningConfig(ffn_num=TFFN, d_model=TDIM) if dropout is None
              else TuningConfig(ffn_num=TFFN, d_model=TDIM, dropout=dropout))
    model = VideoVisionTransformer(cfg, tuning=tuning, select=SEL,
                                   dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(23),
                        jnp.zeros((1, T_FRAMES, TIMG, TIMG, 3)))["params"]
    for i in range(TDEPTH):
        blk = params[f"blocks_{i}"]
        blk["mlp_token_select"]["mlp_head"]["kernel"] = (
            blk["mlp_token_select"]["mlp_head"]["kernel"] * 30.0)
        blk["adaptmlp"]["up_proj"]["kernel"] = jnp.asarray(
            rs.randn(TFFN, TDIM).astype(np.float32) * 0.02)
    params["query_token"] = jnp.asarray(
        rs.randn(1, 1, TDIM).astype(np.float32) * 0.02)
    ca = params["attentive_blocks"]["cross_attn"]
    ca["q_bias"] = jnp.asarray(rs.randn(TDIM).astype(np.float32) * 0.02)
    ca["v_bias"] = jnp.asarray(rs.randn(TDIM).astype(np.float32) * 0.02)

    flat = {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(params).items()}
    ref = build_reference_video_model(img=TIMG, patch=TPATCH, dim=TDIM,
                                      depth=TDEPTH, heads=THEADS,
                                      classes=VCLASSES, ffn=TFFN)
    missing, unexpected = ref.load_state_dict(
        flax_to_video_sd(flat, depth=TDEPTH), strict=True)
    assert not missing and not unexpected
    zero_adapter_dropout(ref)
    return ref, model, params


def test_evaluate_video_executed_multiview():
    """engine_finetune.evaluate_video executed: views flattened into the
    batch, per-view logits re-chunked [B,V,-1] and MEANED before the metric
    (engine_finetune.py:302-306) — vs our model + the same protocol our
    video_runner.evaluate implements."""
    from dynamic_tuning_tpu.utils.metrics import topk_accuracy

    T, V, VB, NB = T_FRAMES, 2, 2, 3
    rs = np.random.RandomState(23)
    ref, model, params = _reference_video_setup(rs)
    ref.eval()

    batches = [(np.clip(rs.randn(VB, V, T, TIMG, TIMG, 3), -2.6, 2.6)
                .astype(np.float32),
                rs.randint(0, VCLASSES, (VB,)).astype(np.int64))
               for _ in range(NB)]

    # --- ours: flatten views into batch, mean per-view logits -------------
    def apply(x):  # x: [n, T, H, W, 3]
        out, _ = model.apply({"params": params}, jnp.asarray(x))
        return np.asarray(out)

    preds = np.concatenate([
        apply(x.reshape(VB * V, T, TIMG, TIMG, 3))
        .reshape(VB, V, -1).mean(axis=1) for x, _ in batches])
    labels = np.concatenate([y for _, y in batches])
    our_acc1 = topk_accuracy(jnp.asarray(preds), jnp.asarray(labels), (1,))[0]

    # --- reference loop executed -------------------------------------------
    eng = load_reference_engine()
    # reference video layout: [B, V, C, T, H, W]
    loader = [(torch.from_numpy(x).permute(0, 1, 5, 2, 3, 4).contiguous(),
               torch.from_numpy(y)) for x, y in batches]
    # unlike `evaluate`, the video loop's FLOPs accounting is live
    # (engine_finetune.py:342-344): it asserts "BASE" in args.finetune and
    # sums flops_dict[t+1] over per-layer kept-token counts.  The table's
    # VALUES are parity-pinned separately (test_flops.py vs the closed
    # form); here a zero table lets the executed protocol run end-to-end.
    args = SimpleNamespace(metric="accuracy", nb_classes=VCLASSES,
                           finetune="VIT_BASE_IN21K")
    with torch.no_grad():
        status = eng["engine"].evaluate_video(
            loader, ref, torch.device("cpu"), LOGGER,
            base_flops=0.0, flops_dict=torch.zeros(4096), args=args)
    assert our_acc1 == pytest.approx(status["metric"], abs=1e-4)


# ---------------------------------------------------------------------------
# train_video_one_epoch, executed
# ---------------------------------------------------------------------------

def test_train_video_one_epoch_executed(monkeypatch):
    """engine_finetune.train_video_one_epoch (:112-204, same composition as
    the image loop but through the video model's tubelet stem + attentive
    pooling) executed vs our video train engine — the exact wiring
    video_runner uses (make_train_step + VideoRunner._trainable_pred
    mirroring main_video.py:283-289's freeze-by-missing + head rule)."""
    from dynamic_tuning_tpu.train.engine import (create_train_state,
                                                 make_train_step,
                                                 model_apply_fn)
    from dynamic_tuning_tpu.train.optim import (make_optimizer,
                                                partition_params,
                                                warmup_cosine_schedule)
    from dynamic_tuning_tpu.train.video_runner import VideoRunner
    from dynamic_tuning_tpu.utils.meters import MetricLogger

    STEPS, EPOCHS, WARMUP = 6, 2.0, 0.5
    BASE_LR, WD, VB = 5e-3, 0.01, 4

    rs = np.random.RandomState(41)
    ref, model, params = _reference_video_setup(rs, dropout=0.0)
    data = [(rs.randn(VB, T_FRAMES, TIMG, TIMG, 3).astype(np.float32) * 0.5,
             rs.randint(0, VCLASSES, (VB,)).astype(np.int64))
            for _ in range(STEPS)]

    # --- JAX side: the video runner's exact train wiring -------------------
    monkeypatch.setattr(jax.random, "logistic",
                        lambda key, shape=(), dtype=jnp.float32:
                        jnp.zeros(shape, dtype))
    trainable, frozen = partition_params(params, VideoRunner._trainable_pred)
    tx = make_optimizer(BASE_LR, epochs=EPOCHS, warmup_epochs=WARMUP,
                        steps_per_epoch=STEPS, weight_decay=WD)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(7))
    step = make_train_step(model_apply_fn(model), tx, SEL)
    sched = warmup_cosine_schedule(BASE_LR, 0.0, EPOCHS, WARMUP, STEPS)
    ml = MetricLogger(logger=LOGGER)
    for i, (x, y) in enumerate(data):
        state, parts = step(state, jnp.asarray(x), jnp.asarray(y))
        ml.update(lr=float(sched(i)),
                  **{k: float(v) for k, v in parts.items()
                     if k != "keep_ratio"})
    ours = {k: m.global_avg for k, m in ml.meters.items()}

    # --- torch side: the reference's OWN video loop, executed ---------------
    zero_gumbel_noise(monkeypatch)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    mods = load_reference_modules()
    eng = load_reference_engine()
    crit = mods["losses"].AdaLoss(
        base_criterion=torch.nn.CrossEntropyLoss(),
        token_target_ratio=SEL.token_target_ratio,
        token_loss_ratio=SEL.token_loss_ratio,
        token_minimal=0.0, token_minimal_weight=0.0)
    # main_video.py freeze rule: missing-from-image-ckpt keys (adapters,
    # routers, attentive pool, query token) + head stay trainable
    for name, p in ref.named_parameters():
        p.requires_grad = ("adaptmlp" in name or "mlp_token_select" in name
                           or "attentive_blocks" in name
                           or "query_token" in name
                           or name.startswith("head."))
    opt = torch.optim.AdamW(
        [p for _, p in ref.named_parameters() if p.requires_grad],
        lr=BASE_LR, weight_decay=WD)
    # reference video layout: [B, C, T, H, W]
    loader = [(torch.from_numpy(x).permute(0, 4, 1, 2, 3).contiguous(),
               torch.from_numpy(y)) for x, y in data]
    args = SimpleNamespace(accum_iter=1, lr=BASE_LR, min_lr=0.0,
                           warmup_epochs=WARMUP, epochs=EPOCHS)
    ref.train(True)
    stats = eng["engine"].train_video_one_epoch(
        ref, crit, loader, opt, torch.device("cpu"), epoch=0,
        loss_scaler=eng["misc"].NativeScalerWithGradNormCount(),
        max_norm=None, mixup_fn=None, log_writer=None, args=args,
        logger=LOGGER)

    for key in ("loss", "base_loss", "token_loss", "teacher_loss",
                "distillation_loss"):
        assert ours[key] == pytest.approx(stats[key], rel=3e-4, abs=2e-5), \
            f"{key}: ours {ours[key]} reference-executed {stats[key]}"
    assert ours["lr"] == pytest.approx(stats["lr"], rel=1e-6)
