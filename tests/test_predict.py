"""predict.py CLI end-to-end: checkpoint -> images dir -> per-image JSON."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import predict
from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train import checkpoint as C

ARCH = ["--img_size", "32", "--patch_size", "8", "--embed_dim", "64",
        "--depth", "2", "--num_heads", "4", "--ffn_num", "8",
        "--nb_classes", "10"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("predict")
    rs = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rs.randint(0, 256, (50, 70, 3), np.uint8)).save(
            d / f"img{i}.jpg")
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=10, embed_dim=64,
                      depth=2, num_heads=4, gelu_approx=True,
                      residual_dtype="bfloat16")
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(), dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    ckpt = str(d / "model.msgpack")
    C.save_params(ckpt, params)
    return str(d), ckpt


def test_predict_dispatch_mode(setup, capsys):
    images_dir, ckpt = setup
    args = predict.get_args_parser().parse_args(
        ["--ckpt", ckpt, "--images", images_dir, "--mode", "dispatch",
         "--batch_size", "3"] + ARCH)
    results = predict.main(args)
    assert len(results) == 5
    for r in results:
        assert 0 <= r["label"] < 10
        assert 0.0 <= r["prob"] <= 1.0
        assert 0.0 <= r["keep_ratio"] <= 1.0
    # JSON lines printed
    out = capsys.readouterr().out
    assert out.count('"path"') == 5


def test_predict_auto_mode_crossover(setup, monkeypatch):
    """auto = dense below the measured crossover batch, dispatch at/above.

    Threshold lowered to 3 so the 5 images split into a dispatch chunk
    (3 >= 3) and a dense tail chunk (2 < 3)."""
    images_dir, ckpt = setup
    monkeypatch.setattr(predict, "AUTO_DISPATCH_MIN_BATCH", 3)
    args = predict.get_args_parser().parse_args(
        ["--ckpt", ckpt, "--images", images_dir, "--mode", "auto",
         "--batch_size", "3"] + ARCH)
    results = predict.main(args)
    assert len(results) == 5
    assert all(r["keep_ratio"] < 1.0 for r in results[:3])   # dispatched
    assert all(r["keep_ratio"] == 1.0 for r in results[3:])  # dense tail


def test_predict_single_file_dense(setup):
    images_dir, ckpt = setup
    args = predict.get_args_parser().parse_args(
        ["--ckpt", ckpt, "--images", f"{images_dir}/img0.jpg",
         "--mode", "dense"] + ARCH)
    results = predict.main(args)
    assert len(results) == 1
    assert results[0]["keep_ratio"] == 1.0     # dense: no gating


def test_predict_quant_routes_through_flax(setup, monkeypatch):
    """--quant int8 must actually run the W8A8 path (flax apply), not the
    quant-blind fast forward (review finding: it was a silent no-op)."""
    monkeypatch.setenv("DYT_FUSED_ATTN", "interpret")
    images_dir, ckpt = setup
    args = predict.get_args_parser().parse_args(
        ["--ckpt", ckpt, "--images", images_dir, "--mode", "mask",
         "--quant", "int8"] + ARCH)
    out = predict.main(args)
    assert len(out) == 5 and all("label" in r for r in out)
    # int8 must change logits vs the bf16 fast path (not a no-op)
    args2 = predict.get_args_parser().parse_args(
        ["--ckpt", ckpt, "--images", images_dir, "--mode", "mask"] + ARCH)
    out2 = predict.main(args2)
    assert any(abs(a["prob"] - b["prob"]) > 1e-6 for a, b in zip(out, out2))


def test_pil_fallback_matches_native_geometry(setup, monkeypatch):
    """The PIL fallback must do short-side resize + center crop like the
    native decoder, not an aspect-destroying square stretch."""
    from dynamic_tuning_tpu.data import native_loader as NL

    images_dir, _ = setup
    path = f"{images_dir}/img0.jpg"
    monkeypatch.setattr(NL, "available", lambda: False)
    pil = predict._load_canvas(path, 32)
    assert pil.shape == (32, 32, 3)
    native = NL.decode_resize(path, 32)
    if native is not None:  # compare geometry when the native lib exists
        diff = np.abs(pil.astype(np.int32) - native.astype(np.int32))
        # same crop window; PIL vs our bilinear differ only in rounding
        assert diff.mean() < 30, diff.mean()
