"""Seg serving: the SHIPPED configuration measured as one number, plus the
full lever matrix in ONE session (VERDICT r4 #4).

Round 4 left seg serving as a parts list (tile-batch +25%, narrow head
2.59x, int8 chip-state-dependent) with the compound never measured.  This
runs the real slide-inference protocol (crop 512 / stride 341, the
reference our_vit.py test_cfg) on an ADE20K-shaped eval image end-to-end:

  matrix: tile_batch {1,4} x head {768 parity, 256 narrow} x {bf16, int8},
  all DyT dispatch, plus the dense-768-bf16 reference point — interleaved
  in one session so ratios survive chip-state drift.

Also isolates the BACKBONE-ONLY dispatch ratio at 512^2 (N=1025): the
router's seg-side value independent of UPerHead dominance.

Run (TPU): python scripts/bench_seg_compound.py
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
from dynamic_tuning_tpu.models.upernet import DyTSegmentor, slide_inference


def main():
    ap = argparse.ArgumentParser()
    # ADE20K eval resizes the short side to 512; 512x683 is the canonical
    # 4:3 val geometry -> a 1x2 window grid; --wide uses 512x1365 (1x4)
    ap.add_argument("--img_w", type=int, default=683)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    H, W = 512, args.img_w
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (H, W, 3), jnp.float32)
    sel = SelectConfig(token_target_ratio=0.5)

    def build(head, quant, dispatch):
        cfg = ModelConfig(img_size=512, gelu_approx=True,
                          residual_dtype="bfloat16", quant=quant)
        tun = TuningConfig() if dispatch else TuningConfig(ffn_adapt=False)
        s = sel if dispatch else SelectConfig(open=False)
        model = DyTSegmentor(cfg, num_classes=150, tuning=tun, select=s,
                             head_channels=head if head != 768 else None,
                             dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 512, 512, 3)))["params"]
        def apply_tiles(p, tiles):
            logits, _aux, _sel = model.apply({"params": p}, tiles,
                                             training=False,
                                             dispatch=dispatch)
            return logits
        return apply_tiles, params

    variants = {}
    for head in (768, 256):
        for quant in ("none", "int8"):
            variants[f"dyt_h{head}_{quant}"] = build(head, quant, True)
    variants["dense_h768_none"] = build(768, "none", False)

    # One jitted scan program per combo (slide x iters, one scalar
    # readback): block_until_ready does NOT wait for remote execution on
    # the tunnel backend (measured 0.44 "ms"/slide — bogus), so all timing
    # here is float()-readback over a scan, the house pattern (bench.py,
    # bench_util).  One compile per combo; post-compile timing rounds
    # interleave ALL combos so ratios survive chip-state drift.
    combos = [(name, tb) for name in variants for tb in (1, 4)]
    progs = {}
    best = {c: float("inf") for c in combos}

    def make_prog(fn, tb):
        @jax.jit
        def prog(p, im):
            def body(c, _):
                out = slide_inference(
                    fn, p, im + (c != 0).astype(im.dtype),
                    num_classes=150, crop=512, stride=341, tile_batch=tb)
                return out.sum().astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return s
        return prog

    def time_combo(name, tb):
        fn, p = variants[name]
        if (name, tb) not in progs:
            progs[(name, tb)] = make_prog(fn, tb)
            _ = float(progs[(name, tb)](p, img))      # compile + warm
        t0 = time.perf_counter()
        _ = float(progs[(name, tb)](p, img))
        return (time.perf_counter() - t0) / args.iters

    for name, tb in combos:                     # compile pass + first timing
        best[(name, tb)] = min(best[(name, tb)], time_combo(name, tb))
        print(json.dumps({"compiled": f"{name}_tb{tb}",
                          "ms": round(best[(name, tb)] * 1e3, 2)}),
              flush=True)
    for _ in range(3):                          # warm interleaved rounds
        for c in combos:
            best[c] = min(best[c], time_combo(*c))

    out = {}
    base = best[("dense_h768_none", 1)]
    for (name, tb), dt in sorted(best.items()):
        out[f"{name}_tb{tb}"] = dict(
            ms_per_image=round(dt * 1e3, 2),
            img_s=round(1.0 / dt, 3),
            vs_dense_tb1=round(base / dt, 4))
        print(json.dumps({f"{name}_tb{tb}": out[f"{name}_tb{tb}"]}),
              flush=True)

    ship = best[("dyt_h768_none", 1)]
    print(json.dumps({
        "shipping_default": "dyt_h768_none_tb1",
        "shipping_vs_reference_protocol_dense": round(base / ship, 4),
        "compound_best": min(out, key=lambda k: out[k]["ms_per_image"]),
    }), flush=True)

    # --- backbone-only dispatch ratio at 512^2 (router value isolated) ----
    bcfg = ModelConfig(img_size=512, gelu_approx=True,
                       residual_dtype="bfloat16")
    bx = jax.random.normal(rng, (4, 512, 512, 3), jnp.float32)
    bb_dyt = SegVisionTransformer(bcfg, tuning=TuningConfig(), select=sel,
                                  dtype=jnp.bfloat16)
    bb_dense = SegVisionTransformer(bcfg, tuning=TuningConfig(ffn_adapt=False),
                                    select=SelectConfig(open=False),
                                    dtype=jnp.bfloat16)
    pd = bb_dyt.init(jax.random.PRNGKey(1), bx[:1])["params"]
    pn = bb_dense.init(jax.random.PRNGKey(1), bx[:1])["params"]

    def mk(model, **kw):
        def f(xx, p):
            feats, _ = model.apply({"params": p}, xx, training=False, **kw)
            return sum(f.sum() for f in feats)
        return f

    tdyt = tdense = float("inf")
    for _ in range(3):
        tdyt = min(tdyt, device_time(mk(bb_dyt, dispatch=True), bx, pd,
                                     i1=2, i2=6))
        tdense = min(tdense, device_time(mk(bb_dense), bx, pn, i1=2, i2=6))
    print(json.dumps({
        "backbone_dyt_ms": round(tdyt * 1e3, 2),
        "backbone_dense_ms": round(tdense * 1e3, 2),
        "backbone_dispatch_vs_dense": round(tdense / tdyt, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
