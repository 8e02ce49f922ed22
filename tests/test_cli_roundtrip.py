"""CLI knob round-trip: flags must reach the config every entry point uses
(VERDICT r1: gelu_approx/residual_dtype/remat were dropped by main_video,
clip_grad/weight_decay by the seg runner)."""

import sys

sys.path.insert(0, ".")


def test_video_config_forwards_model_knobs():
    import main_video

    args = main_video.get_args_parser().parse_args(
        ["--gelu_approx", "--remat", "--residual_dtype", "bfloat16",
         "--clip_grad", "1.0", "--dataset", "ssv2", "--num_frames", "16"])
    cfg = main_video.build_config(args)
    assert cfg.model.gelu_approx is True
    assert cfg.model.remat == "full"     # bare --remat = full-block remat
    assert cfg.model.residual_dtype == "bfloat16"
    assert cfg.model.num_frames == 16
    assert cfg.optim.clip_grad == 1.0
    assert cfg.data.randaug == "rand-m7-n4-mstd0.5-inc1"   # SSv2 recipe


def test_image_config_forwards_clip_grad():
    import main_image
    from dynamic_tuning_tpu.cli import args_to_config

    args = main_image.get_args_parser().parse_args(
        ["--clip_grad", "0.5", "--weight_decay", "0.2"])
    cfg = args_to_config(args)
    assert cfg.optim.clip_grad == 0.5
    assert cfg.optim.weight_decay == 0.2


def test_fulltune_and_auto_remove_roundtrip():
    import main_image
    from dynamic_tuning_tpu.cli import args_to_config

    default = args_to_config(main_image.get_args_parser().parse_args([]))
    assert default.fulltune is False and default.auto_remove is True
    cfg = args_to_config(main_image.get_args_parser().parse_args(
        ["--fulltune", "--no_auto_remove"]))
    assert cfg.fulltune is True and cfg.auto_remove is False


def test_seg_defaults_keep_reference_wd():
    import seg_train
    from dynamic_tuning_tpu.cli import args_to_config

    args = seg_train.get_args_parser().parse_args([])
    cfg = args_to_config(args)
    # reference seg config: AdamW weight_decay 0.05
    # (configs/beit/upernet/our_vit.py)
    assert cfg.optim.weight_decay == 0.05


def test_seg_train_forwards_model_knobs(monkeypatch):
    """seg_train extends (not rebuilds) the CLI ModelConfig: quant /
    gelu_approx / residual_dtype must survive into the runner config."""
    import seg_train as st

    captured = {}

    class FakeRunner:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg

        def run(self):
            return {}

    monkeypatch.setattr(st, "SegRunner", FakeRunner)
    args = st.get_args_parser().parse_args(
        ["--quant", "int8", "--gelu_approx", "--residual_dtype", "bfloat16",
         "--crop_size", "128"])
    st.main(args)
    m = captured["cfg"].model
    assert m.quant == "int8" and m.gelu_approx and \
        m.residual_dtype == "bfloat16" and m.img_size == 128
