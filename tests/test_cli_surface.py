"""Flag-surface parity with the reference CLIs.

Extracts every ``--flag`` the reference entry points declare (AST-parsed
from /root/reference/{main_image,main_vtab,main_video,speed}.py — no
reference code is executed) and asserts each one is accepted by our
corresponding entry point, so the reference launch scripts
(train_IN21K.sh, train_vtab.sh, train_video.sh, measure_speed.sh) run
against this framework unchanged.  The scripts' exact argv vectors are
replayed verbatim below.

The seg CLI is intentionally different (the reference's is an mmcv
config-file front-end, tools/seg_train.py:76; ours is the dataclass CLI
with our_vit.py's values as defaults) — only the DyT-specific flags are
asserted there, the mmcv infrastructure flags are a documented divergence.
"""

import ast
import os

import pytest

import main_image
import main_vtab
import main_video
import seg_train
import speed
from dynamic_tuning_tpu.cli import args_to_config

REFERENCE_ROOT = os.environ.get("DYT_REFERENCE_ROOT", "/root/reference")

needs_reference = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_ROOT, "main_image.py")),
    reason="reference tree not present")


def reference_flags(relpath: str):
    """All '--flag' strings passed to add_argument in a reference file."""
    with open(os.path.join(REFERENCE_ROOT, relpath)) as fh:
        tree = ast.parse(fh.read())
    flags = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            for a in node.args:
                if (isinstance(a, ast.Constant) and isinstance(a.value, str)
                        and a.value.startswith("--")):
                    flags.add(a.value)
    assert flags, f"no flags parsed from {relpath} (file moved?)"
    return flags


def accepted_flags(parser):
    return set(parser._option_string_actions)


@needs_reference
@pytest.mark.parametrize("ref_file,ours", [
    ("main_image.py", main_image),
    ("main_vtab.py", main_vtab),
    ("main_video.py", main_video),
    ("speed.py", speed),
])
def test_every_reference_flag_accepted(ref_file, ours):
    missing = reference_flags(ref_file) - accepted_flags(ours.get_args_parser())
    assert not missing, (
        f"{ref_file} flags our {ours.__name__} CLI rejects: {sorted(missing)}")


# mmcv config-file front-end flags with no analogue in the dataclass CLI;
# reason per flag (reference tools/seg_train.py:28-74)
SEG_DIVERGENCE = {
    "--work-dir": "--output_dir (same role, reference common spelling)",
    "--load-from": "--finetune / --eval_ckpt",
    "--resume-from": "--resume",
    "--no-validate": "--eval_interval controls eval cadence",
    "--gpus": "device topology is discovered (SPMD), not declared",
    "--gpu-ids": "same",
    "--deterministic": "runs are deterministic by construction (jax PRNG)",
    "--options": "mmcv config-dict override syntax; use explicit flags",
    "--dataset_name": "--dataset (ade20k)",
}


@needs_reference
def test_seg_dyt_flags_accepted():
    ref = reference_flags("dense_tasks/Segmentation/tools/seg_train.py")
    ours = accepted_flags(seg_train.get_args_parser())
    missing = ref - ours - set(SEG_DIVERGENCE)
    assert not missing, f"undocumented seg CLI divergence: {sorted(missing)}"
    # the DyT-specific flags must be genuinely shared, not waved through
    for flag in ("--finetune", "--eval", "--fulltune", "--ffn_num",
                 "--token_target_ratio", "--seed"):
        assert flag in ours


# The exact argv each reference recipe script passes (minus the
# torch.distributed.launch wrapper), transcribed from the .sh files.
RECIPE_ARGV = {
    "train_IN21K.sh": (main_image, (
        "--batch_size 128 --cls_token --finetune VIT_BASE_IN21K --dist_eval "
        "--output_dir {out} --drop_path 0.0 --blr 1e-3 --weight_decay 0.01 "
        "--dataset cifar100_full --ffn_adapt --auto_remove "
        "--token_target_ratio 0.5")),
    "train_vtab.sh": (main_vtab, (
        "--batch_size 64 --cls_token --finetune VIT_BASE_IN21K --dist_eval "
        "--output_dir {out} --drop_path 0.0 --dataset svhn --ffn_num 16 "
        "--ffn_adapt --auto_remove --eval_freq 1 --token_target_ratio 0.5")),
    "train_video.sh": (main_video, (
        "--batch_size 16 --cls_token --finetune VIT_BASE_IN21K --dist_eval "
        "--output_dir {out} --drop_path 0.0 --blr 1e-3 --epochs 12 "
        "--warmup_epochs 2 --weight_decay 0.01 --dataset K400 --ffn_adapt "
        "--auto_remove --token_target_ratio 0.5")),
    "measure_speed.sh": (speed, (
        "--batch_size 128 --cls_token --finetune VIT_BASE_IN21K --dist_eval "
        "--output_dir {out} --drop_path 0.0 --blr 1e-3 --weight_decay 0.01 "
        "--dataset cifar100_full --ffn_adapt --auto_remove "
        "--token_target_ratio 0.5 --eval --eval_ckpt some_ckpt")),
}


def test_seg_recipe_argv_parses():
    """tools/seg_train.sh: `seg_train.py $CONFIG --launcher pytorch
    --finetune VIT_BASE_IN21K` parses; the recipe config path is
    recognized as the built-in defaults."""
    args = seg_train.get_args_parser().parse_args(
        ["configs/beit/upernet/our_vit.py", "--launcher", "pytorch",
         "--finetune", "VIT_BASE_IN21K"])
    assert args.config.endswith("our_vit.py")
    assert args.crop_size == 512 and args.slide_stride == 341


@pytest.mark.parametrize("script", sorted(RECIPE_ARGV))
def test_reference_recipe_argv_parses(script, tmp_path):
    mod, argv = RECIPE_ARGV[script]
    args = mod.get_args_parser().parse_args(
        argv.format(out=tmp_path).split())
    if mod is main_video:
        cfg = mod.build_config(args)
        assert cfg.data.mirror  # K400 recipe, not SSv2
    elif mod is speed:
        assert args.ckpt == "some_ckpt"  # --eval_ckpt aliases --ckpt
    else:
        cfg = args_to_config(args)
        assert cfg.select.token_target_ratio == 0.5
        assert cfg.finetune == "VIT_BASE_IN21K"  # unresolved: registry empty


def test_compat_noops_do_not_change_config(tmp_path):
    base = ["--output_dir", str(tmp_path), "--dataset", "synthetic"]
    noops = ["--cls_token", "--dist_eval", "--pin_mem", "--global_pool",
             "--dist_on_itp", "--vpt", "--vpt_num", "3",
             "--model", "vit_base_patch16_224_in21k"]
    p = main_image.get_args_parser()
    assert args_to_config(p.parse_args(base)) == \
        args_to_config(p.parse_args(base + noops))


def test_unknown_model_rejected(tmp_path):
    args = main_image.get_args_parser().parse_args(
        ["--output_dir", str(tmp_path), "--model", "vit_large_patch16"])
    with pytest.raises(ValueError, match="unknown model"):
        args_to_config(args)


def test_dead_and_ignored_flags_warn(tmp_path, caplog):
    import logging

    args = main_image.get_args_parser().parse_args(
        ["--output_dir", str(tmp_path), "--vpt", "--device", "cuda",
         "--world_size", "8"])
    with caplog.at_level(logging.WARNING, logger="dynamic_tuning_tpu"):
        args_to_config(args)
    text = caplog.text
    assert "--vpt" in text and "never read" in text
    assert "--device" in text and "--world_size" in text


def test_start_epoch_and_log_dir_wired(tmp_path):
    args = main_image.get_args_parser().parse_args(
        ["--output_dir", str(tmp_path), "--start_epoch", "7",
         "--log_dir", str(tmp_path / "tb")])
    cfg = args_to_config(args)
    assert cfg.start_epoch == 7
    assert cfg.log_dir == str(tmp_path / "tb")


def test_full_suffix_dataset_names(tmp_path):
    """The reference's *_full names (image_datasets.py:32-96) resolve to the
    same builders as our bare names; bare VTAB-overlapping names pick the
    VTAB task like the reference's dispatch order does."""
    from dynamic_tuning_tpu.data.datasets import build_image_dataset

    tr_full, _, nc, metric = build_image_dataset("synthetic_full", str(tmp_path))
    assert nc == 100  # suffix tolerated on the synthetic stand-in

    # bare "svhn" must take the VTAB branch (FileNotFound on the filelist
    # root proves the branch; the full-SVHN branch would ask for .mat files)
    with pytest.raises(FileNotFoundError, match="train800val200"):
        build_image_dataset("svhn", str(tmp_path), no_aug=True)

    # "svhn_full" must NOT be swallowed by the VTAB alias after suffix
    # stripping — it selects the full-SVHN parser (reference
    # image_datasets.py:57-63), which asks for the .mat files
    with pytest.raises(FileNotFoundError) as ei:
        build_image_dataset("svhn_full", str(tmp_path))
    assert "train800val200" not in str(ei.value)
    assert ".mat" in str(ei.value) or "svhn" in str(ei.value).lower()

    # same for dtd_full / oxford_iiit_pet_full (VTAB-overlapping names)
    for name in ("dtd_full", "oxford_iiit_pet_full"):
        with pytest.raises(FileNotFoundError) as ei:
            build_image_dataset(name, str(tmp_path))
        assert "train800val200" not in str(ei.value)


def test_registry_accepts_recipe_spellings(tmp_path, monkeypatch):
    """K400 / cifar100_full resolve registry entries keyed by the bare
    lowercase names (the paths.py convention, mirroring the reference's
    DATASETS dict indexed by base name, image_datasets.py:33)."""
    import main_image
    from dynamic_tuning_tpu import paths

    monkeypatch.setenv("DYT_CLUSTER", "testcluster")
    paths.register_cluster("testcluster",
                           {"cifar100": "/data/c100", "k400": "/data/k400"},
                           {"VIT_BASE_IN21K": "/ckpts/vit.pth"})
    p = main_image.get_args_parser()
    cfg = args_to_config(p.parse_args(["--dataset", "cifar100_full"]))
    assert cfg.data.data_path == "/data/c100"
    cfg = args_to_config(p.parse_args(["--dataset", "K400"]))
    assert cfg.data.data_path == "/data/k400"
    cfg = args_to_config(p.parse_args(["--finetune", "VIT_BASE_IN21K"]))
    assert cfg.finetune == "/ckpts/vit.pth"


def test_start_epoch_fast_forwards_lr_schedule(tmp_path):
    """--start_epoch without --resume must begin at the absolute-epoch LR
    point (reference lr_sched on `range(args.start_epoch, epochs)`), not
    replay warmup from zero."""
    import main_image
    from dynamic_tuning_tpu.train.runner import Runner

    base = ("--batch_size 32 --dataset synthetic --epochs 10 "
            "--warmup_epochs 2 --num_workers 0 --output_dir").split()
    p = main_image.get_args_parser()
    r0 = Runner(args_to_config(p.parse_args(base + [str(tmp_path / "a")])))
    r5 = Runner(args_to_config(p.parse_args(
        base + [str(tmp_path / "b")] + ["--start_epoch", "5"])))
    spe = r0.steps_per_epoch
    # epoch-5 start == epoch-5 point of the plain schedule (past warmup,
    # on the cosine), not the warmup ramp
    assert float(r5.lr_at(0)) == pytest.approx(float(r0.lr_at(5 * spe)),
                                               rel=1e-6)
    assert float(r5.lr_at(0)) > float(r0.lr_at(0))


def test_dead_value_flags_warn(caplog):
    import logging
    import main_video

    args = main_video.get_args_parser().parse_args(
        ["--linprob", "False", "--input_size", "256"])
    with caplog.at_level(logging.WARNING, logger="dynamic_tuning_tpu"):
        from dynamic_tuning_tpu.cli import check_compat_args
        check_compat_args(args)
    assert "--linprob" in caplog.text and "--input_size" in caplog.text


def test_video_dataset_names_case_insensitive():
    from dynamic_tuning_tpu.data.video import build_video_dataset

    with pytest.raises(FileNotFoundError):
        build_video_dataset("K400", "/nonexistent")  # not KeyError
    with pytest.raises(FileNotFoundError):
        build_video_dataset("SSV2", "/nonexistent")
