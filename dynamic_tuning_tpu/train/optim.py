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


def lars(learning_rate, *, weight_decay: float = 0.0,
         momentum: float = 0.9,
         trust_coefficient: float = 0.001) -> optax.GradientTransformation:
    """LARS optimizer (reference util/lars.py — unused by the live recipes but
    part of the component inventory): layer-wise LR scaled by
    trust * ||w|| / ||g + wd * w|| (the wd-adjusted gradient's norm, as the
    reference computes it), then SGD momentum.  1-D params (biases, norms)
    skip both weight decay and the trust ratio, matching the reference's
    ``p.ndim == 1`` exclusion.  ``learning_rate`` must be a float — wrap
    with optax.inject_hyperparams for schedules."""
    if callable(learning_rate):
        raise ValueError("lars takes a float lr; wrap with "
                         "optax.inject_hyperparams for schedules")

    def init(params):
        return optax.trace(decay=momentum, nesterov=False).init(params)

    mom = optax.trace(decay=momentum, nesterov=False)

    def update(grads, state, params):
        def adjust(g, p):
            if p.ndim <= 1:
                return g
            g = g + weight_decay * p
            pn = jnp.linalg.norm(p)
            gn = jnp.linalg.norm(g)
            ratio = jnp.where((pn > 0) & (gn > 0),
                              trust_coefficient * pn / gn, 1.0)
            return g * ratio

        adjusted = jax.tree_util.tree_map(adjust, grads, params)
        updates, state = mom.update(adjusted, state, params)
        updates = jax.tree_util.tree_map(lambda u: -learning_rate * u,
                                         updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def layerwise_lr_decay_mask(params, *, num_layers: int = 12,
                            decay_rate: float = 0.65):
    """Per-parameter LR multipliers with layer-wise decay (reference
    util/lr_decay.py): embed/cls/pos get the deepest decay, block i gets
    decay^(num_layers - i), head/norm get 1.0."""
    flat = params if isinstance(params, dict) and params and \
        isinstance(next(iter(params)), tuple) else traverse_util.flatten_dict(params)

    def scale_for(path):
        name = path[0]
        if name in ("cls_token", "pos_embed", "patch_embed"):
            layer = 0
        elif name.startswith("blocks_"):
            layer = int(name.split("_")[1]) + 1
        else:
            layer = num_layers + 1
        return decay_rate ** (num_layers + 1 - layer)

    return {k: scale_for(k) for k in flat}


def scale_by_layer_decay(scales) -> optax.GradientTransformation:
    """Chainable transform applying per-param multipliers (layer decay)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return ({k: u * scales[k] for k, u in updates.items()}, state)

    return optax.GradientTransformation(init, update)


def make_optimizer(base_lr: float, *, min_lr: float = 0.0, epochs: float = 100,
                   warmup_epochs: float = 20, steps_per_epoch: int = 1,
                   weight_decay: float = 0.01,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   clip_grad: float | None = None,
                   layer_decay: float | None = None,
                   start_step: int = 0,
                   params=None) -> optax.GradientTransformation:
    # start_step: fast-forward the schedule for --start_epoch without
    # --resume — the reference computes lr from the ABSOLUTE epoch number
    # (engine_finetune.py:39 passes `epoch + i/len` into lr_sched with the
    # loop starting at args.start_epoch), so epoch 50 of 100 must begin at
    # the epoch-50 cosine point, not replay warmup.  Resume restores the
    # optimizer count directly and must pass 0 here.
    base = warmup_cosine_schedule(base_lr, min_lr, epochs, warmup_epochs,
                                  steps_per_epoch)
    sched = (lambda step: base(step + start_step)) if start_step else base
    tx = optax.adamw(sched, b1=betas[0], b2=betas[1], eps=1e-8,
                     weight_decay=weight_decay)
    parts = []
    if clip_grad is not None:
        parts.append(optax.clip_by_global_norm(clip_grad))
    parts.append(tx)
    if layer_decay is not None:
        if params is None:
            raise ValueError("layer_decay needs the params tree")
        parts.append(scale_by_layer_decay(
            layerwise_lr_decay_mask(params, decay_rate=layer_decay)))
    return optax.chain(*parts) if len(parts) > 1 else tx


def with_grad_accumulation(tx: optax.GradientTransformation,
                           accum_iter: int) -> optax.GradientTransformation:
    """Gradient accumulation (reference --accum_iter,
    engine_finetune.py:73-79: losses averaged over accum_iter micro-steps,
    optimizer stepped every accum_iter).  optax.MultiSteps averages grads and
    applies the inner update once per ``accum_iter`` calls — same effective
    semantics, still one jitted step per micro-batch."""
    if accum_iter <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=accum_iter).gradient_transformation()
