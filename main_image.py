"""Image-classification fine-tuning entry point (full datasets).

TPU-native counterpart of the reference main_image.py (same flag surface,
same recipe defaults: train_IN21K.sh — blr 1e-3, wd 0.01, 100 epochs,
warmup 20, batch 128/process).  Single program, SPMD over all local devices;
no torch.distributed launcher needed.
"""

import argparse

from dynamic_tuning_tpu.cli import add_common_args, args_to_config
from dynamic_tuning_tpu.train.runner import Runner


def get_args_parser():
    parser = argparse.ArgumentParser("DyT image fine-tuning", add_help=False)
    return add_common_args(parser)


def main(args):
    from dynamic_tuning_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()
    cfg = args_to_config(args)
    runner = Runner(cfg)
    if args.eval:
        if args.eval_ckpt:
            runner.load_eval_checkpoint(args.eval_ckpt)
        stats = runner.evaluate()
        print(f"Accuracy on the val set: {stats['acc1']:.1f}%")
        return stats
    return runner.run()


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    main(args)
