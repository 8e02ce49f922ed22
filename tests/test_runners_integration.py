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
