"""Optimizer + LR schedule + parameter freezing.

Reference behavior:
  * LR schedule: linear warmup then half-cosine, evaluated at fractional-epoch
    granularity every iteration (util/lr_sched.py:9-21, engine_finetune.py:38).
  * Optimizer: AdamW over *trainable* params only (main_image.py:285), uniform
    weight decay (torch AdamW semantics: wd applies to every param).
  * Freezing: params missing from the pretrained checkpoint + the head stay
    trainable; everything loaded is frozen (main_image.py:249-256).

TPU-native: freezing is done structurally — the param pytree is partitioned
into (trainable, frozen) sub-trees and the gradient is taken only w.r.t. the
trainable one, so frozen weights cost zero optimizer state and zero backward
FLOPs for their weight-gradients.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

Params = Any

# param-path predicates ---------------------------------------------------------

TRAINABLE_KEYWORDS = ("adaptmlp", "mlp_token_select", "head")


def default_trainable_predicate(path: Tuple[str, ...]) -> bool:
    """Reference freeze rule (main_image.py:249-256): adapters + routers +
    classifier head train; the pretrained backbone is frozen."""
    return any(k in path for k in ("adaptmlp", "mlp_token_select")) or path[0] == "head"


def partition_params(params: Params,
                     predicate: Callable[[Tuple[str, ...]], bool] = default_trainable_predicate
                     ) -> Tuple[Dict, Dict]:
    """Split a flax param tree into (trainable, frozen) flat-dict halves."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if predicate(k)}
    frozen = {k: v for k, v in flat.items() if not predicate(k)}
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Params:
    return traverse_util.unflatten_dict({**frozen, **trainable})


def count_params(flat: Dict, exclude_head: bool = True) -> int:
    n = 0
    for k, v in flat.items():
        if exclude_head and "head" in k:
            continue
        n += v.size
    return n


# LR schedule ---------------------------------------------------------------------

def warmup_cosine_schedule(base_lr: float, min_lr: float, epochs: float,
                           warmup_epochs: float, steps_per_epoch: int
                           ) -> optax.Schedule:
    """Per-iteration fractional-epoch warmup+half-cosine (util/lr_sched.py:9-21).

    lr(e) = base * e / warmup                      for e < warmup
    lr(e) = min + (base-min) * 0.5*(1+cos(pi*(e-warmup)/(epochs-warmup)))
    """

    def schedule(step):
        e = step / steps_per_epoch
        warm = base_lr * e / jnp.maximum(warmup_epochs, 1e-8)
        prog = (e - warmup_epochs) / jnp.maximum(epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(e < warmup_epochs, warm, cos)

    return schedule


def make_optimizer(base_lr: float, *, min_lr: float = 0.0, epochs: float = 100,
                   warmup_epochs: float = 20, steps_per_epoch: int = 1,
                   weight_decay: float = 0.01,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   clip_grad: float | None = None
                   ) -> optax.GradientTransformation:
    sched = warmup_cosine_schedule(base_lr, min_lr, epochs, warmup_epochs,
                                   steps_per_epoch)
    tx = optax.adamw(sched, b1=betas[0], b2=betas[1], eps=1e-8,
                     weight_decay=weight_decay)
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx
