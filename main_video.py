"""Video-recognition fine-tuning entry point (K400 / SSv2).

TPU-native counterpart of the reference main_video.py (train_video.sh recipe:
batch 16/process, blr 1e-3, K400 12 epochs / SSv2 50 epochs, warmup 2,
8 frames)."""

import argparse
import dataclasses

from dynamic_tuning_tpu.cli import add_common_args, args_to_config
from dynamic_tuning_tpu.config import DataConfig
from dynamic_tuning_tpu.train.video_runner import VideoRunner


def get_args_parser():
    parser = argparse.ArgumentParser("DyT video fine-tuning", add_help=False)
    parser = add_common_args(parser)
    parser.set_defaults(batch_size=16, warmup_epochs=2, epochs=12,
                        dataset="k400")
    parser.add_argument("--num_frames", type=int, default=8)
    parser.add_argument("--tubelet_size", type=int, default=1,
                        help=">1 = VideoMAE-style 3-D tubelet patch stem")
    parser.add_argument("--sampling_rate", type=int, default=16)
    parser.add_argument("--test_num_segment", type=int, default=3)
    parser.add_argument("--test_num_crop", type=int, default=1)
    parser.add_argument("--train_resize_type", type=str, default=None,
                        choices=["random_resized_crop",
                                 "random_short_side_scale_jitter"],
                        help="default resolves per dataset like the "
                             "reference recipes: K400 jitter [1.0,1.15]x"
                             "crop, SSv2 random_resized_crop")
    # reference main_video.py:117-141 declares these but never reads them
    # (zero args.<flag> uses outside the parser) — accepted so reference
    # launch scripts run unchanged; cli.check_compat_args warns on
    # non-default values (see _DEAD_NONDEFAULT there)
    dead = "dead in the reference (declared, never read); accepted + warned"
    parser.add_argument("--linprob", default=True, help=dead)
    parser.add_argument("--use_mean_pooling", default=True, help=dead)
    parser.add_argument("--drop", type=float, default=0.0, help=dead)
    parser.add_argument("--attn_drop_rate", type=float, default=0.0,
                        help=dead)
    parser.add_argument("--init_scale", type=float, default=0.001, help=dead)
    parser.add_argument("--num_segments", type=int, default=1, help=dead)
    parser.add_argument("--num_sample", type=int, default=1, help=dead)
    parser.add_argument("--crop_pct", type=float, default=None, help=dead)
    parser.add_argument("--short_side_size", type=int, default=224,
                        help=dead)
    parser.add_argument("--input_size", type=int, default=224, help=dead)
    return parser


def build_config(args):
    cfg = args_to_config(args)
    # case-insensitive: the reference scripts spell these K400 / SSV2
    is_ssv2 = args.dataset.lower() in ("ssv2", "sthv2")
    # reference recipe defaults (video_datasets.py:20-65): K400 trains with
    # short-side scale jitter over [1.0, 1.15] x crop; SSv2 with
    # RandomResizedCrop.  Explicit --train_resize_type wins.
    resize_type = args.train_resize_type or (
        "random_resized_crop" if is_ssv2
        else "random_short_side_scale_jitter")
    crop = cfg.model.img_size
    return cfg.replace(
        # extend (not rebuild) the CLI-derived ModelConfig so knobs like
        # gelu_approx / residual_dtype / remat reach the video path too
        model=dataclasses.replace(cfg.model, num_frames=args.num_frames,
                                  tubelet_size=args.tubelet_size),
        data=DataConfig(dataset=args.dataset, data_path=args.data_path,
                        batch_size=args.batch_size,
                        num_workers=args.num_workers,
                        inception_norm=args.inception,
                        num_frames=args.num_frames,
                        sampling_rate=args.sampling_rate,
                        test_num_segment=args.test_num_segment,
                        test_num_crop=args.test_num_crop,
                        # SSv2 trains with RandAugment and NO mirror —
                        # its labels are direction-sensitive
                        # (reference video_datasets.py:56-58)
                        randaug=("rand-m7-n4-mstd0.5-inc1"
                                 if is_ssv2 else None),
                        mirror=not is_ssv2,
                        train_resize_type=resize_type,
                        # K400 jitter bounds: round(crop * [1.0, 1.15])
                        jitter_min=round(crop * 1.0),
                        jitter_max=round(crop * 1.15)))


def main(args):
    from dynamic_tuning_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()
    runner = VideoRunner(build_config(args))
    if args.eval:
        if args.eval_ckpt:
            runner.load_eval_checkpoint(args.eval_ckpt)
        return runner.evaluate()
    return runner.run()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
