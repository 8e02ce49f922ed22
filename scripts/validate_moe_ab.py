"""MoE-adapter accuracy A/B (VERDICT r3 #5).

The MoE-enhanced adapter is a paper-only feature (reference README.md:27 —
"MoE-enhanced adapter further improves adaptation"; no code in the
snapshot).  This script produces the first accuracy evidence for our
implementation (models/layers.py::MoEAdapter): MoE-4 vs single adapter at
EQUAL steps on synthetic tasks, under the reference freeze rule (only
adapters + routers + head train, train/optim.py::default_trainable_predicate).

Arms (all trained with identical schedule/steps/batches):
  * single_b8  — plain bottleneck adapter, ffn_num=8 (reference default
                 shape scaled to the tiny d_model=64 probe)
  * single_b32 — plain adapter with 4x bottleneck: parameter-matched to
                 MoE-4x8 (equal-budget comparison)
  * moe4_b8    — MoEAdapter, 4 experts of bottleneck 8 (the paper's shape)

Tasks:
  * plain  — single-domain prototype classification (the validate_dynamics
             task): homogeneous, no a-priori reason for expert
             specialization.
  * hetero — TWO style domains with independent class prototypes sharing
             one label space; a single shared bottleneck must encode both
             domain corrections while a router can specialize experts
             per domain.  This is the setting the paper's claim is about.

Each (arm, task) runs over --seeds seeds (data + init + gate noise all
reseeded); holdout accuracy is reported as mean +/- std.  Results land in
BENCH.md and the margins pin tests/test_moe_ab.py.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/validate_moe_ab.py [--steps 600] [--seeds 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("DYT_VALIDATE_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_eval_step, make_train_step,
                                             model_apply_fn)
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params

HOLDOUT = 128


def make_hetero_task(n=512, size=32, classes=10, domains=2, seed=0,
                     noise=20.0):
    """Domain-mixture task: per-domain class prototypes, shared labels.

    Every class has `domains` independent visual prototypes; the model sees
    a uniform mixture and must map both appearances to one label.  The
    domain id is recoverable from the image (the prototypes differ), so a
    token router CAN specialize experts by domain — the heterogeneity the
    MoE adapter is meant to exploit."""
    rs = np.random.RandomState(seed)
    protos = rs.randint(0, 256, (domains, classes, size, size, 3)).astype(
        np.float32)
    labels = rs.randint(0, classes, n)
    doms = rs.randint(0, domains, n)
    imgs = protos[doms, labels] + rs.randn(n, size, size, 3) * noise
    x = np.clip(imgs, 0, 255) / 127.5 - 1.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(labels), doms


def make_plain_task(n=512, size=32, classes=10, seed=0, noise=20.0):
    rs = np.random.RandomState(seed)
    protos = rs.randint(0, 256, (classes, size, size, 3)).astype(np.float32)
    labels = rs.randint(0, classes, n)
    imgs = protos[labels] + rs.randn(n, size, size, 3) * noise
    x = np.clip(imgs, 0, 255) / 127.5 - 1.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(labels), None


ARMS = {
    "single_b8": dict(ffn_num=8),
    "single_b32": dict(ffn_num=32),            # param-matched to moe4_b8
    "moe4_b8": dict(ffn_num=8, moe_experts=4),
}


def run_arm(arm, task, seed, steps, ratio=0.5, batch=64, lr=5e-3,
            classes=10, domains=2, noise=20.0, n=768):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=classes,
                      embed_dim=64, depth=4, num_heads=4)
    tun = TuningConfig(d_model=64, **ARMS[arm])
    sel = SelectConfig(token_target_ratio=ratio)
    model = VisionTransformer(cfg, tuning=tun, select=sel, dtype=jnp.float32)

    if task == "hetero":
        x, y, _doms = make_hetero_task(n=n, classes=classes, domains=domains,
                                       noise=noise, seed=100 + seed)
    else:
        x, y, _doms = make_plain_task(n=n, classes=classes, noise=noise,
                                      seed=100 + seed)
    n_train = x.shape[0] - HOLDOUT
    xh, yh = x[-HOLDOUT:], y[-HOLDOUT:]

    params = model.init(jax.random.PRNGKey(seed), x[:2])["params"]
    tr, fr = partition_params(params)
    n_adapter = sum(v.size for k, v in tr.items()
                    if "adaptmlp" in k)
    tx = make_optimizer(lr, warmup_epochs=1, epochs=30,
                        steps_per_epoch=max(1, steps // 30))
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(1000 + seed))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, sel))
    for i in range(steps):
        b = (i * batch) % n_train
        state, parts = step(state, x[b:b + batch], y[b:b + batch])
    logits, ts = jax.jit(make_eval_step(model_apply_fn(model)))(
        state.trainable, state.frozen, xh)
    return dict(acc=float((logits.argmax(-1) == yh).mean()),
                loss_last=float(parts["loss"]),
                train_keep=round(float(parts["keep_ratio"]), 3),
                eval_keep=round(float(ts.mean()), 3),
                adapter_params=int(n_adapter))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tasks", default="plain,hetero")
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--domains", type=int, default=2)
    ap.add_argument("--noise", type=float, default=20.0)
    ap.add_argument("--n", type=int, default=768)
    args = ap.parse_args()

    table = {}
    for task in args.tasks.split(","):
        for arm in ARMS:
            accs, aux = [], None
            for s in range(args.seeds):
                r = run_arm(arm, task, s, args.steps, classes=args.classes,
                            domains=args.domains, noise=args.noise, n=args.n)
                accs.append(r["acc"])
                aux = r
                print(json.dumps({"task": task, "arm": arm, "seed": s, **{
                    k: round(v, 3) if isinstance(v, float) else v
                    for k, v in r.items()}}), flush=True)
            table[(task, arm)] = dict(
                acc_mean=round(float(np.mean(accs)), 4),
                acc_std=round(float(np.std(accs)), 4),
                adapter_params=aux["adapter_params"])
            print(json.dumps({"task": task, "arm": arm,
                              **table[(task, arm)]}), flush=True)

    # summary + the paper-claim check: MoE-4 >= single adapter (same
    # bottleneck) on the heterogeneous task
    for task in args.tasks.split(","):
        row = {a: table[(task, a)]["acc_mean"] for a in ARMS
               if (task, a) in table}
        print(json.dumps({"summary": task, **row}), flush=True)
    print("AB DONE")


if __name__ == "__main__":
    main()
