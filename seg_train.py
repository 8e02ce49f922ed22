"""Semantic-segmentation training entry point (ADE20K, UperNet + DyT ViT).

TPU-native counterpart of the reference
dense_tasks/Segmentation/tools/seg_train.py with the our_vit.py recipe:
crop 512, AdamW 1e-3 wd 0.05, poly LR (1500-iter warmup), 160k iters,
slide eval crop 512 / stride 341, mIoU every 16k iters.
"""

import argparse

from dynamic_tuning_tpu.cli import add_common_args, args_to_config
from dynamic_tuning_tpu.train.seg_runner import SegRunner


def get_args_parser():
    p = argparse.ArgumentParser("DyT segmentation training", add_help=False)
    p = add_common_args(p)
    # the reference CLI is an mmcv config-file front-end
    # (tools/seg_train.sh passes `seg_train.py $CONFIG --launcher pytorch
    # --finetune VIT_BASE_IN21K`); accept that shape: our defaults ARE
    # our_vit.py's values, so the recipe config needs no interpretation —
    # any OTHER config path warns that it is not read
    p.add_argument("config", nargs="?", default="",
                   help="mmcv config path (reference CLI compatibility); "
                        "our_vit.py's values are the built-in defaults — "
                        "other config files are not interpreted (warned)")
    p.add_argument("--launcher", default="none",
                   help="ignored (no launcher; SPMD under one mesh)")
    p.set_defaults(dataset="ade20k", batch_size=2, lr=1e-3, weight_decay=0.05,
                   drop_path=0.1)
    p.add_argument("--crop_size", type=int, default=512)
    p.add_argument("--total_iters", type=int, default=160_000)
    p.add_argument("--eval_interval", type=int, default=16_000)
    p.add_argument("--slide_stride", type=int, default=341)
    p.add_argument("--slide_tile_batch", type=int, default=1,
                   help="window tiles per eval forward (default 1 = the "
                        "reference's one-at-a-time cadence, which is also "
                        "the faster compute (batching 512^2 tiles costs "
                        "~17%% per tile — BENCH.md round 5); raise to 2-4 "
                        "only when per-dispatch latency dominates, e.g. a "
                        "remote/tunneled device: fewer launches, "
                        "numerically identical, clamped to the real "
                        "window count)")
    p.add_argument("--seg_norm", default="gn", choices=["gn", "bn"],
                   help="head norm: gn (stateless) or bn (SyncBN parity)")
    p.add_argument("--seg_head_channels", type=int, default=0,
                   help="OPT-IN deviation from the reference head config "
                        "(our_vit.py channels=768): narrower UPerHead "
                        "working width, e.g. 256 (~9x cheaper head; the "
                        "head is flop-bound, see BENCH.md).  0 = reference "
                        "parity")
    return p


def main(args):
    from dynamic_tuning_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()
    if args.config and not args.config.endswith("our_vit.py"):
        import logging
        logging.getLogger("dynamic_tuning_tpu").warning(
            "config file %r is NOT read: this CLI encodes the reference "
            "recipe (our_vit.py) as its defaults — set the equivalent "
            "flags instead", args.config)
    cfg = args_to_config(args)
    # extend (not rebuild) the CLI-derived ModelConfig so gelu_approx /
    # residual_dtype / remat / quant reach the seg path too
    import dataclasses
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, img_size=args.crop_size, drop_path_rate=args.drop_path))
    runner = SegRunner(cfg, total_iters=args.total_iters,
                       eval_interval=args.eval_interval,
                       crop=args.crop_size, slide_stride=args.slide_stride,
                       tile_batch=args.slide_tile_batch,
                       norm=args.seg_norm,
                       head_channels=args.seg_head_channels)
    if args.eval:
        if args.eval_ckpt:
            runner.load_eval_checkpoint(args.eval_ckpt)
        return runner.evaluate()
    return runner.run()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
