"""MoE-adapter serving cost (VERDICT r3 #5 second half; r4 #2 fusion).

Round 4 measured the MoE adapter's MODULE-PATH fallback at a 1.21x serving
premium.  Round 5 fused the stacked-expert mixture into the DyT prologue
kernel (ops/mha_serving.py::dyt_prologue_serving_moe), so this now measures
the fused MoE serving cost on the real path, full-scale ViT-B/16 224^2
batch 128 bf16 capacity-dispatch (the bench.py protocol):

  A. plain adapter, fused kernels ON           (the headline config)
  B. MoE-4 adapter, fused MoE prologue         (north-star acceptance:
                                                within <=8% of A)
  C. MoE-4 adapter, DYT_FUSED_ATTN=0           (context: fully unfused MoE)
  D. plain adapter, DYT_FUSED_ATTN=0           (context: fully unfused)
  E. plain adapter, int8 fused                 (the int8 headline config)
  F. MoE-4 adapter, int8 fused MoE prologue    (ops/quant.py::
                                                dyt_prologue_serving_q8_moe)

Timings via scripts/bench_util.device_time (tunnel-RTT-free scan
difference), variants timed back-to-back in one session so the ratios
survive chip-speed drift.

Run (TPU): python scripts/profile_moe_cost.py [--batch 128]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--i2", type=int, default=25)
    args = ap.parse_args()

    cfg = ModelConfig(num_classes=100, gelu_approx=True,
                      residual_dtype="bfloat16")
    sel = SelectConfig(token_target_ratio=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, 224, 224, 3), jnp.float32)

    variants = {
        "plain_fused": (TuningConfig(), "1", "none"),
        "moe4_fused": (TuningConfig(moe_experts=4), "1", "none"),
        "moe4_unfused": (TuningConfig(moe_experts=4), "0", "none"),
        "plain_unfused": (TuningConfig(), "0", "none"),
        "plain_q8_fused": (TuningConfig(), "1", "int8"),
        "moe4_q8_fused": (TuningConfig(moe_experts=4), "1", "int8"),
    }

    out = {}
    for name, (tun, fused, quant) in variants.items():
        os.environ["DYT_FUSED_ATTN"] = fused
        model = VisionTransformer(dataclasses.replace(cfg, quant=quant),
                                  tuning=tun, select=sel,
                                  dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(1), x[:2])["params"]

        def fwd(xx, p):
            # array arg first: device_time perturbs args[0] per iteration
            logits, _ = model.apply({"params": p}, xx, dispatch=True)
            return logits.sum()

        dt = device_time(fwd, x, params, i1=5, i2=args.i2)
        out[name] = dict(ms=round(dt * 1e3, 3),
                         img_s=round(args.batch / dt, 1))
        print(json.dumps({name: out[name]}), flush=True)

    a, b = out["plain_fused"]["ms"], out["moe4_fused"]["ms"]
    aq, bq = out["plain_q8_fused"]["ms"], out["moe4_q8_fused"]["ms"]
    print(json.dumps({
        "moe_serving_premium": round(b / a, 4),
        "moe_premium_ms": round(b - a, 3),
        "moe_q8_serving_premium": round(bq / aq, 4),
        "moe_q8_premium_ms": round(bq - aq, 3),
        "moe_unfused_context_ms": out["moe4_unfused"]["ms"],
        "all_unfused_context_ms": out["plain_unfused"]["ms"],
    }))


if __name__ == "__main__":
    main()
