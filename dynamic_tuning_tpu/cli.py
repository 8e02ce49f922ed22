"""Shared CLI argument handling.

Mirrors the reference's argparse surface (main_image.py:40-131) mapped onto
the dataclass config tree.  Flags keep the reference names so recipes port
1:1 (e.g. ``--blr 1e-3 --token_target_ratio 0.5 --ffn_num 64``).
"""

from __future__ import annotations

import argparse

from dynamic_tuning_tpu.config import (DataConfig, MeshConfig, ModelConfig,
                                       OptimConfig, RunConfig, SelectConfig,
                                       TuningConfig)


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--batch_size", default=128, type=int,
                        help="Batch size per process")
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--accum_iter", default=1, type=int)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--clip_grad", type=float, default=None,
                        help="global grad-norm clip (reference max_norm, "
                             "engine_finetune.py:74)")
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--blr", type=float, default=1e-3)
    parser.add_argument("--min_lr", type=float, default=0.0)
    parser.add_argument("--warmup_epochs", type=float, default=20)
    parser.add_argument("--finetune", default="", help="pretrained ckpt path")
    parser.add_argument("--dataset", default="cifar100")
    parser.add_argument("--data_path", default="")
    parser.add_argument("--nb_classes", default=1000, type=int)
    parser.add_argument("--output_dir", default="./output_dir")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default="")
    parser.add_argument("--ckpt_backend", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="orbax = async sharded multi-pod saves")
    parser.add_argument("--auto_remove", action="store_true", default=True,
                        help="prune superseded epoch checkpoints (reference "
                             "misc.py:316; ON by default here)")
    parser.add_argument("--no_auto_remove", dest="auto_remove",
                        action="store_false",
                        help="keep every epoch checkpoint")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--eval_ckpt", type=str, default="")
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--eval_freq", default=1, type=int)
    parser.add_argument("--save_freq", default=1, type=int)
    parser.add_argument("--drop_path", type=float, default=0.0)
    parser.add_argument("--inception", action="store_true",
                        help="inception mean/std (jx IN21K pretrain)")
    parser.add_argument("--canvas", type=int, default=None,
                        help="decode-canvas short side (default 256 aug / "
                             "224 no-aug); larger keeps more source detail "
                             "for the train crop at loader cost")
    parser.add_argument("--fulltune", action="store_true",
                        help="train the full backbone, not just adapters/"
                             "router/head (reference main_image.py:254)")
    parser.add_argument("--ffn_adapt", action="store_true", default=True)
    parser.add_argument("--ffn_num", default=64, type=int)
    parser.add_argument("--adapter_scalar", default="0.1", type=str)
    parser.add_argument("--moe_experts", default=0, type=int,
                        help="N>1 enables the MoE-enhanced adapter")
    parser.add_argument("--token_target_ratio", type=float, default=0.5)
    parser.add_argument("--token_loss_ratio", type=float, default=2.0)
    parser.add_argument("--keep_layers", type=int, default=0)
    parser.add_argument("--no_select", action="store_true",
                        help="disable the token dispatcher")
    parser.add_argument("--capacity_ratio", type=float, default=None)
    parser.add_argument("--eval_dispatch", action="store_true",
                        help="evaluate via the capacity-dispatch path")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    # perf knobs (BENCH.md: fast config trains ~19% faster; parity defaults)
    parser.add_argument("--gelu_approx", action="store_true",
                        help="tanh GELU (cheaper on the VPU)")
    parser.add_argument("--residual_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="residual-stream dtype (bfloat16 = fast)")
    parser.add_argument("--remat", nargs="?", const="full", default=False,
                        choices=["full", "scores"],
                        help="backward rematerialization for big batches: "
                             "'full' re-runs whole blocks; 'scores' (cheaper) "
                             "recomputes only the fp32 attention score "
                             "tensors, the dominant activation term")
    parser.add_argument("--quant", default="none",
                        choices=["none", "int8", "int8_attn"],
                        help="int8 = W8A8 serving matmuls (eval paths only)")
    return parser


def args_to_config(args, *, no_aug: bool = False) -> RunConfig:
    tuning = TuningConfig(ffn_adapt=args.ffn_adapt, ffn_num=args.ffn_num,
                          ffn_adapter_scalar=args.adapter_scalar,
                          moe_experts=args.moe_experts)
    select = SelectConfig(open=not args.no_select,
                          keep_layers=args.keep_layers,
                          token_target_ratio=args.token_target_ratio,
                          token_loss_ratio=args.token_loss_ratio,
                          capacity_ratio=args.capacity_ratio)
    optim = OptimConfig(blr=args.blr, lr=args.lr, min_lr=args.min_lr,
                        weight_decay=args.weight_decay,
                        clip_grad=args.clip_grad,
                        warmup_epochs=args.warmup_epochs, epochs=args.epochs)
    data = DataConfig(dataset=args.dataset, data_path=args.data_path,
                      batch_size=args.batch_size, num_workers=args.num_workers,
                      inception_norm=args.inception, no_aug=no_aug,
                      canvas=getattr(args, "canvas", None))
    model = ModelConfig(num_classes=args.nb_classes,
                        drop_path_rate=args.drop_path,
                        gelu_approx=args.gelu_approx,
                        residual_dtype=args.residual_dtype,
                        remat=args.remat, quant=args.quant)
    return RunConfig(model=model, tuning=tuning, select=select, optim=optim,
                     data=data, mesh=MeshConfig(model_parallel=args.model_parallel),
                     seed=args.seed, output_dir=args.output_dir,
                     eval_dispatch=args.eval_dispatch,
                     eval_freq=args.eval_freq, save_freq=args.save_freq,
                     resume=args.resume, finetune=args.finetune,
                     fulltune=args.fulltune, accum_iter=args.accum_iter,
                     compute_dtype=args.compute_dtype,
                     ckpt_backend=args.ckpt_backend,
                     auto_remove=args.auto_remove)
