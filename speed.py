"""Throughput measurement harness.

Reference protocol (speed.py:247-275): batch 128, mixed precision, warmup
iterations then timed iterations with device fencing; prints img/s.  Here the
efficient-inference model is the capacity-bounded dispatch path
(ops/dispatch.py) instead of the reference's dynamic nonzero gather.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train import checkpoint as C


def get_args_parser():
    p = argparse.ArgumentParser("DyT speed test", add_help=False)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--nb_classes", default=100, type=int)
    p.add_argument("--ffn_num", default=64, type=int)
    p.add_argument("--moe_experts", default=0, type=int,
                   help="measure the MoE-enhanced adapter (fused prologue "
                        "in bf16 and int8)")
    p.add_argument("--moe_router_tau", default=1.0, type=float)
    p.add_argument("--token_target_ratio", type=float, default=0.5)
    p.add_argument("--capacity_ratio", type=float, default=None)
    p.add_argument("--mode", default="dispatch",
                   choices=["dispatch", "mask", "dense", "plain"])
    p.add_argument("--ckpt", default="", help="optional trained .msgpack/.pth")
    p.add_argument("--warmup", default=5, type=int)
    p.add_argument("--iters", default=15, type=int)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--residual_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--gelu_approx", action="store_true", default=True)
    p.add_argument("--gelu_exact", dest="gelu_approx", action="store_false")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8_attn"],
                   help="int8 = W8A8 serving matmuls (ops/quant.py)")
    # the reference's speed.py reuses main_image's FULL training parser
    # (speed.py:150), so measure_speed.sh passes training flags; accept
    # them (no-ops for a pure timing harness) so the script runs unchanged
    p.add_argument("--eval_ckpt", dest="ckpt", default=argparse.SUPPRESS,
                   help="alias of --ckpt (the reference measure_speed.sh "
                        "flag name)")
    p.add_argument("--finetune", default="",
                   help="pretrained ckpt (path or DYT_CLUSTER registry "
                        "key); used when --ckpt/--eval_ckpt not given — "
                        "weights do not change timing")
    from dynamic_tuning_tpu.cli import add_reference_compat_args
    add_reference_compat_args(p)
    noop = "accepted for reference-script compatibility; no-op here"
    p.add_argument("--epochs", default=100, type=int, help=noop)
    p.add_argument("--accum_iter", default=1, type=int, help=noop)
    p.add_argument("--weight_decay", default=0.01, type=float, help=noop)
    p.add_argument("--lr", default=None, type=float, help=noop)
    p.add_argument("--blr", default=1e-3, type=float, help=noop)
    p.add_argument("--min_lr", default=0.0, type=float, help=noop)
    p.add_argument("--warmup_epochs", default=20, type=float, help=noop)
    p.add_argument("--output_dir", default="", help=noop)
    p.add_argument("--seed", default=0, type=int, help=noop)
    p.add_argument("--resume", default="", help=noop)
    p.add_argument("--eval", action="store_true", help=noop)
    p.add_argument("--num_workers", default=4, type=int, help=noop)
    p.add_argument("--save_freq", default=1, type=int, help=noop)
    p.add_argument("--auto_remove", action="store_true", help=noop)
    p.add_argument("--eval_freq", default=1, type=int, help=noop)
    p.add_argument("--dataset", default="cifar100", help=noop)
    p.add_argument("--drop_path", default=0.0, type=float, help=noop)
    p.add_argument("--inception", action="store_true", help=noop)
    p.add_argument("--ffn_adapt", action="store_true", default=True,
                   help=noop)
    p.add_argument("--fulltune", action="store_true", help=noop)
    return p


def main(args):
    from dynamic_tuning_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    sel = SelectConfig(token_target_ratio=args.token_target_ratio,
                       capacity_ratio=args.capacity_ratio)
    if args.mode == "plain":
        # the reference's dense baseline: the ORIGINAL ViT, no adapter/router
        # (models/original_vision_transformerl_IN21K.py, speed.py:39)
        sel = SelectConfig(open=False)
        tuning = TuningConfig(ffn_adapt=False)
    else:
        tuning = TuningConfig(ffn_num=args.ffn_num,
                              moe_experts=args.moe_experts,
                              moe_router_tau=args.moe_router_tau)
    model = VisionTransformer(
        ModelConfig(num_classes=args.nb_classes, gelu_approx=args.gelu_approx,
                    residual_dtype=args.residual_dtype, quant=args.quant),
        tuning=tuning, select=sel,
        dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch_size, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x[:2])["params"]
    ckpt = args.ckpt or getattr(args, "finetune", "")
    if ckpt and not os.path.exists(ckpt):
        # registry-key resolution like the reference's CHECKPOINTS dict
        # (configs.py:7; measure_speed.sh passes --finetune VIT_BASE_IN21K)
        from dynamic_tuning_tpu import paths
        resolved = paths.checkpoint_path(ckpt, fallback="")
        if resolved:
            ckpt = resolved
        else:
            print(f"WARNING: checkpoint {ckpt!r} not found (no file, no "
                  f"DYT_CLUSTER registry entry) — timing with random "
                  f"weights (numerically irrelevant for throughput)",
                  file=sys.stderr)
            ckpt = ""
    if ckpt:
        if ckpt.endswith((".pth", ".pt")):
            params, _ = C.import_pretrained(params, C.load_torch_state_dict(ckpt))
        else:
            params = C.load_params(ckpt)

    from dynamic_tuning_tpu.utils.profiling import scan_throughput

    # the flax model path is the fastest for every mode since the fused
    # Pallas serving kernels landed in Block (round 2); the hand-written
    # fast_vit_forward in models/fast_inference.py remains as a validated
    # pure-XLA alternative
    def fwd(p, xx):
        logits, _ = model.apply({"params": p}, xx,
                                complete_model=(args.mode == "dense"),
                                dispatch=(args.mode == "dispatch"))
        return logits.sum()

    ips = scan_throughput(fwd, (params, x), batch=args.batch_size,
                          iters=args.iters, warmup_iters=args.warmup)
    print(json.dumps({"mode": args.mode, "throughput_img_s": round(ips, 2),
                      "batch_size": args.batch_size}))
    return ips


if __name__ == "__main__":
    main(get_args_parser().parse_args())
