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
    add_reference_compat_args(parser)
    return parser


#: the one model family the reference ships (vision_transformer_IN21K.py:414
#: and video_models/video_vision_transformer_IN21K.py:512 register the same
#: factory) — ``--model`` validates against its spellings so typos fail
#: loudly instead of silently training the only model we have.  The
#: reference's parser defaults ('vit_base_patch16', 'vit_base_patch16_224',
#: main_image.py:49 / main_video.py:52) are accepted: there, --model is
#: cosmetic (used for the logger name; the factory call is hardcoded).
KNOWN_MODELS = ("vit_base_patch16_224_in21k", "vit_base_patch16",
                "vit_base_patch16_224")

#: launcher/torch flags with no TPU equivalent: warn when passed a
#: non-default value, because the user expressed an intent we cannot honor.
_IGNORED_NONDEFAULT = {
    "device": (None, "device placement is owned by the JAX runtime"),
    "world_size": (None, "process topology is discovered, not declared "
                         "(parallel/multihost.py)"),
    "local_rank": (None, "no per-process launcher; SPMD under one mesh"),
    "dist_url": (None, "rendezvous comes from the cluster environment "
                       "(env://-style discovery in parallel/multihost.py)"),
}

#: flags the reference DECLARES but never reads (verified by grep over
#: /root/reference: zero ``args.<flag>`` uses outside the parser) — accepted
#: so reference scripts run, warned about so nobody believes they did
#: something.  --vpt is the notable one: VPT was never implemented in the
#: reference either.
_DEAD_IN_REFERENCE = ("global_pool", "vpt")

#: dead-in-reference VALUE flags (main_video.py:117-141): warn only when
#: passed a non-default value — the user expressed an intent neither the
#: reference nor this framework acts on.
_DEAD_NONDEFAULT = {
    "drop": 0.0, "attn_drop_rate": 0.0, "init_scale": 0.001,
    "num_segments": 1, "num_sample": 1, "crop_pct": None,
    "short_side_size": 224, "input_size": 224,
    # default=True value flags (reference main_video.py:117,125)
    "linprob": True, "use_mean_pooling": True,
}


def add_reference_compat_args(parser: argparse.ArgumentParser):
    """Accept the rest of the reference CLI surface (main_image.py:40-131,
    main_video.py:40-150, speed.py, main_vtab.py) so reference launch
    scripts (train_IN21K.sh etc.) run against these entry points unchanged.

    Three classes, spelled out per flag below:
      * live — wired to our config (``--model``, ``--log_dir``,
        ``--start_epoch``);
      * satisfied — the requested behavior is the always-on behavior here
        (``--cls_token``: CLS pooling is the live mode; ``--dist_eval``:
        eval is always distributed with sentinel padding);
      * ignored/dead — DDP-launcher concepts and flags the reference
        declares but never reads; accepted, warned about when non-default.
    """
    g = parser.add_argument_group("reference compatibility")
    g.add_argument("--model", default="vit_base_patch16_224_in21k",
                   help="model name (validated; the reference ships exactly "
                        "this family)")
    g.add_argument("--log_dir", default="",
                   help="TensorBoard event dir (reference main_image.py; "
                        "default: output_dir)")
    g.add_argument("--start_epoch", default=0, type=int,
                   help="first epoch index when not resuming from a "
                        "checkpoint (--resume restores it automatically)")
    g.add_argument("--cls_token", action="store_true", default=True,
                   help="satisfied: CLS pooling is the live mode (the "
                        "reference scripts pass this)")
    g.add_argument("--dist_eval", action="store_true",
                   help="satisfied: eval is always distributed here "
                        "(sentinel-padded tail batches, mesh.pad_eval_batch)")
    g.add_argument("--pin_mem", action="store_true", default=True,
                   help="ignored: torch DataLoader concept; host->device "
                        "staging is owned by the runtime")
    g.add_argument("--no_pin_mem", action="store_false", dest="pin_mem")
    g.add_argument("--device", default=None, help="ignored (JAX runtime)")
    g.add_argument("--world_size", default=None, type=int,
                   help="ignored (topology discovered)")
    g.add_argument("--local_rank", default=None, type=int,
                   help="ignored (no launcher)")
    g.add_argument("--dist_on_itp", action="store_true",
                   help="ignored (no launcher)")
    g.add_argument("--dist_url", default=None, help="ignored (no launcher)")
    g.add_argument("--global_pool", action="store_true",
                   help="DEAD in the reference (declared, never read; CLS "
                        "pooling is what actually runs) — accepted + warned")
    g.add_argument("--vpt", action="store_true",
                   help="DEAD in the reference (VPT flags declared, never "
                        "consumed — VPT was never implemented there) — "
                        "accepted + warned")
    g.add_argument("--vpt_num", default=1, type=int, help="see --vpt")
    return parser


def check_compat_args(args) -> None:
    """Validate/warn on the reference-compat flags (called by
    args_to_config; safe on Namespaces that never defined them)."""
    import logging

    log = logging.getLogger("dynamic_tuning_tpu")
    model = getattr(args, "model", KNOWN_MODELS[0])
    if model not in KNOWN_MODELS:
        raise ValueError(
            f"--model {model!r}: unknown model; the reference (and this "
            f"framework) ships {KNOWN_MODELS} — video/seg variants are "
            f"selected by the entry point, not the model name")
    for flag in _DEAD_IN_REFERENCE:
        if getattr(args, flag, False):
            log.warning(
                "--%s is declared but never read by the reference "
                "(dead flag); it does nothing here either", flag)
    for flag, (default, why) in _IGNORED_NONDEFAULT.items():
        if getattr(args, flag, default) != default:
            log.warning("--%s is ignored: %s", flag, why)
    for flag, default in _DEAD_NONDEFAULT.items():
        if getattr(args, flag, default) != default:
            log.warning(
                "--%s=%s has no effect: the reference declares this flag "
                "but never reads it (dead), and so does this framework",
                flag, getattr(args, flag))


def args_to_config(args, *, no_aug: bool = False) -> RunConfig:
    check_compat_args(args)
    # CLI invocations get the persistent XLA compilation cache (multi-minute
    # jit compiles survive process restarts — sweeps, resumes, serving
    # relaunches); DYT_COMPILE_CACHE=0 opts out, tests never enter here
    from dynamic_tuning_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    # registry-key resolution, like the reference's
    # ``CHECKPOINTS[args.finetune]`` / ``DATASETS`` dicts keyed by the
    # CLUSTER env var (main_image.py:369-370, configs.py:4-34): --finetune
    # VIT_BASE_IN21K and a per-dataset data_path resolve through
    # paths.py's DYT_CLUSTER registry when they are not literal paths
    import os as _os

    from dynamic_tuning_tpu import paths as _paths

    finetune = args.finetune
    if finetune and not _os.path.exists(finetune):
        finetune = _paths.checkpoint_path(finetune, fallback=finetune)

    def _registry_data_path(name: str) -> str:
        # registry keys are the bare lowercase names (paths.py example,
        # matching the reference convention of indexing DATASETS by the
        # base name even for *_full runs, image_datasets.py:33); accept
        # the recipe spellings K400 / SSV2 / cifar100_full here too
        for key in (name, name.lower(),
                    name.lower().removesuffix("_full")):
            p = _paths.dataset_path(key, "")
            if p:
                return p
        return ""

    data_path = args.data_path or _registry_data_path(args.dataset)
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
    data = DataConfig(dataset=args.dataset, data_path=data_path,
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
                     resume=args.resume, finetune=finetune,
                     fulltune=args.fulltune, accum_iter=args.accum_iter,
                     compute_dtype=args.compute_dtype,
                     ckpt_backend=args.ckpt_backend,
                     auto_remove=args.auto_remove,
                     log_dir=getattr(args, "log_dir", ""),
                     start_epoch=getattr(args, "start_epoch", 0))
