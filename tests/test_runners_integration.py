"""End-to-end runner integration tests (tiny models, synthetic data, CPU).

These guard the full wiring the CLIs use: loader -> on-device aug -> jitted
train step -> eval (+ FLOPs accounting) -> checkpointing.
"""

import dataclasses

import jax
import pytest

from dynamic_tuning_tpu.config import (DataConfig, ModelConfig, OptimConfig,
                                       RunConfig, SelectConfig, TuningConfig)

TINY = ModelConfig(img_size=32, patch_size=8, num_classes=100, embed_dim=64,
                   depth=2, num_heads=4)
TINY_TUNING = TuningConfig(ffn_num=8, d_model=64)


def _base_cfg(tmp_path, **data_kw):
    return RunConfig(
        model=TINY, tuning=TINY_TUNING, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=16, num_workers=2,
                        **data_kw),
        output_dir=str(tmp_path), compute_dtype="float32")


def test_image_runner_one_epoch(tmp_path):
    from dynamic_tuning_tpu.train.runner import Runner

    runner = Runner(_base_cfg(tmp_path))
    out = runner.run()
    assert "max_metric" in out
    stats = runner.evaluate()
    assert {"acc1", "acc5", "metric", "keep_ratio", "gflops"} <= set(stats)
    # best-metric checkpoint + final weights were written
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("checkpoint-") for f in files)
    assert any(f.name == "final_checkpoint.msgpack" for f in files)


def test_image_runner_fulltune(tmp_path):
    """--fulltune trains the whole backbone (reference main_image.py:254):
    nothing stays frozen and backbone weights actually move."""
    import numpy as np

    from dynamic_tuning_tpu.train.runner import Runner

    runner = Runner(_base_cfg(tmp_path).replace(fulltune=True))
    assert not runner.state.frozen, "fulltune must leave no frozen params"
    before = np.asarray(
        runner.state.trainable[("blocks_0", "attn", "qkv", "kernel")])
    runner.train_one_epoch(0)
    after = np.asarray(
        runner.state.trainable[("blocks_0", "attn", "qkv", "kernel")])
    assert np.abs(after - before).max() > 0, "backbone did not train"


def test_image_runner_resume(tmp_path):
    from dynamic_tuning_tpu.train import checkpoint as C
    from dynamic_tuning_tpu.train.runner import Runner

    cfg = _base_cfg(tmp_path)
    r1 = Runner(cfg)
    r1.run()
    ckpts = sorted(p for p in tmp_path.iterdir()
                   if p.name.startswith("checkpoint-"))
    cfg2 = cfg.replace(resume=str(ckpts[-1]),
                       optim=dataclasses.replace(cfg.optim, epochs=2))
    r2 = Runner(cfg2)
    assert r2.start_epoch == 1
    assert int(r2.state.step) > 0


def test_video_runner_epoch(tmp_path):
    from dynamic_tuning_tpu.train.video_runner import VideoRunner

    cfg = RunConfig(
        model=dataclasses.replace(TINY, num_classes=400, num_frames=3),
        tuning=TINY_TUNING, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2,
                        num_frames=3),
        output_dir=str(tmp_path), compute_dtype="float32")
    runner = VideoRunner(cfg)
    out = runner.run()
    assert "max_metric" in out
    # the video loop writes TB scalars like the reference's
    # (engine_finetune.py:191-197 shares log_writer with the image loop)
    import glob
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def test_seg_runner_short(tmp_path):
    from dynamic_tuning_tpu.train.seg_runner import SegRunner

    cfg = RunConfig(
        model=dataclasses.replace(TINY, img_size=64, depth=4),
        tuning=TINY_TUNING, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3),
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2),
        output_dir=str(tmp_path), compute_dtype="float32")
    runner = SegRunner(cfg, total_iters=10, eval_interval=10, crop=64,
                       slide_stride=48)
    out = runner.run()
    assert "max_miou" in out and out["max_miou"] >= 0


def test_image_runner_orbax_backend(tmp_path):
    """Runner with ckpt_backend=orbax: async sharded save + resume from the
    checkpoint directory."""
    from dynamic_tuning_tpu.train import checkpoint as C
    from dynamic_tuning_tpu.train.runner import Runner

    cfg = _base_cfg(tmp_path).replace(ckpt_backend="orbax")
    r1 = Runner(cfg)
    r1.run()
    C.wait_for_async_saves()
    ckpt_dir = str(tmp_path)
    # orbax step dirs exist
    assert any(p.name.isdigit() for p in tmp_path.iterdir())
    cfg2 = cfg.replace(resume=ckpt_dir,
                       optim=dataclasses.replace(cfg.optim, epochs=2))
    r2 = Runner(cfg2)
    assert r2.start_epoch == 1
    assert int(r2.state.step) > 0


def test_image_runner_resume_restores_best_metric(tmp_path):
    """Regression: max_metric must survive resume, or the first post-resume
    eval always 'improves' over 0.0 and auto_remove prunes the true best."""
    from dynamic_tuning_tpu.train.runner import Runner

    cfg = _base_cfg(tmp_path)
    r1 = Runner(cfg)
    out = r1.run()
    assert out["max_metric"] > 0
    ckpts = sorted(p for p in tmp_path.iterdir()
                   if p.name.startswith("checkpoint-"))
    cfg2 = cfg.replace(resume=str(ckpts[-1]))
    r2 = Runner(cfg2)
    assert r2.max_metric == pytest.approx(out["max_metric"])


def test_video_runner_resume_and_accum(tmp_path):
    """Video runner: --accum_iter wraps the optimizer in MultiSteps (one
    applied update per accum_iter micro-batches, like the image runner) and
    resume restores the best metric + re-shards the state."""
    import optax

    from dynamic_tuning_tpu.train.video_runner import VideoRunner

    cfg = RunConfig(
        model=dataclasses.replace(TINY, num_classes=10, num_frames=2),
        tuning=TINY_TUNING, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3, warmup_epochs=0.2, epochs=1),
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2,
                        num_frames=2),
        output_dir=str(tmp_path), compute_dtype="float32", accum_iter=2)
    r1 = VideoRunner(cfg)
    # MultiSteps state wraps the inner optimizer: mini_step counter exists
    assert isinstance(r1.state.opt_state, optax.MultiStepsState)
    out = r1.run()
    ckpts = sorted(p for p in tmp_path.iterdir()
                   if p.name.startswith("checkpoint-"))
    assert ckpts, "video runner saved no checkpoint"
    r2 = VideoRunner(cfg.replace(resume=str(ckpts[-1])))
    assert r2.start_epoch == 1
    assert r2.max_metric == pytest.approx(out["max_metric"])


def test_seg_runner_bn_stats_sidecar_roundtrip(tmp_path):
    """SyncBN batch_stats persist in an aux sidecar and restore on resume
    (regression: they used to reset to init, collapsing post-resume eval)."""
    import numpy as np

    from dynamic_tuning_tpu.train.seg_runner import SegRunner

    cfg = RunConfig(
        model=dataclasses.replace(TINY, img_size=64, depth=4),
        tuning=TINY_TUNING, select=SelectConfig(),
        optim=OptimConfig(lr=1e-3),
        data=DataConfig(dataset="synthetic", batch_size=8, num_workers=2),
        output_dir=str(tmp_path), compute_dtype="float32")
    r1 = SegRunner(cfg, total_iters=6, eval_interval=6, crop=64,
                   slide_stride=48, norm="bn")
    out = r1.run()
    sidecars = [p for p in tmp_path.iterdir()
                if p.name.startswith("aux-batch_stats-")]
    assert sidecars, "bn run wrote no batch_stats sidecar"
    ckpts = sorted(p for p in tmp_path.iterdir()
                   if p.name.startswith("checkpoint-"))
    r2 = SegRunner(cfg.replace(resume=str(ckpts[-1])), total_iters=6,
                   eval_interval=6, crop=64, slide_stride=48, norm="bn")
    assert r2.max_miou == pytest.approx(out["max_miou"])
    # restored stats match the trained ones, not a fresh init
    a = jax.tree_util.tree_leaves(r1.batch_stats)
    b = jax.tree_util.tree_leaves(r2.batch_stats)
    assert any(float(abs(x).sum()) > 0 for x in a)
    for x1, x2 in zip(a, b):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))
