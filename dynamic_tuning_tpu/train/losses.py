"""Loss functions: AdaLoss (FLOPs-budget) + self-distillation.

Behavioral spec from the reference:
  * AdaLoss           models/losses.py:15-84
      loss = CE + token_loss_ratio * token_loss
      token_loss = (mean(token_select) - target)^2
                   + minimal_weight * sum(clamp(minimal - per_token_mean, 0))
  * self-distillation engine_finetune.py:47-65
      kl  = KL(log_softmax(student) || log_softmax(teacher.detach()),
               batchmean, log_target=True)
      total = AdaLoss + CE(teacher, y) + kl

All reductions run in fp32.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import SelectConfig


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy with integer labels (torch CrossEntropyLoss)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def token_budget_loss(token_select: Optional[jax.Array],
                      cfg: SelectConfig) -> jax.Array:
    """The FLOPs-budget loss on gate activations (losses.py:63-84).

    token_select: [B, L, T, 1] hard/soft gate values (CLS already stripped).
    """
    if token_select is None:
        return jnp.zeros((), jnp.float32)
    ts = token_select.astype(jnp.float32)
    flops_loss = (ts.mean() - cfg.token_target_ratio) ** 2
    if cfg.token_minimal_weight > 0:
        # reference losses.py:74-76: token_select is (b, layers, tokens) and
        # .mean(-1) averages over *tokens*, giving a per-(batch,layer) keep
        # rate that's clamped against the floor.  Our ts is [B, L, T, 1].
        per_layer_rate = ts.mean(axis=(2, 3))
        minimal = jnp.maximum(cfg.token_minimal - per_layer_rate, 0.0).sum()
        flops_loss = flops_loss + cfg.token_minimal_weight * minimal
    return flops_loss


def ada_loss(logits: jax.Array, labels: jax.Array,
             token_select: Optional[jax.Array],
             cfg: SelectConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """base CE + weighted budget loss (losses.py:48-61)."""
    base = cross_entropy(logits, labels)
    tok = cfg.token_loss_ratio * token_budget_loss(token_select, cfg)
    return base + tok, dict(base_loss=base, token_loss=tok)


def distillation_kl(student_logits: jax.Array,
                    teacher_logits: jax.Array) -> jax.Array:
    """KL(student || teacher.detach()), batchmean with log-target
    (engine_finetune.py:52-57).

    torch's F.kl_div(input=log_softmax(s), target=log_softmax(t),
    log_target=True, reduction='batchmean') computes
    sum(exp(lt) * (lt - ls)) / batch.
    """
    ls = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    lt = jax.nn.log_softmax(
        jax.lax.stop_gradient(teacher_logits).astype(jnp.float32), axis=-1)
    kl = jnp.exp(lt) * (lt - ls)
    return kl.sum() / student_logits.shape[0]


def dyt_total_loss(student_logits: jax.Array, teacher_logits: jax.Array,
                   labels: jax.Array, token_select: Optional[jax.Array],
                   cfg: SelectConfig
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The full 4-term DyT training loss (engine_finetune.py:47-65)."""
    loss, parts = ada_loss(student_logits, labels, token_select, cfg)
    teacher_loss = cross_entropy(teacher_logits, labels)
    kl = distillation_kl(student_logits, teacher_logits)
    total = loss + teacher_loss + kl
    parts.update(teacher_loss=teacher_loss, distillation_loss=kl)
    return total, parts
