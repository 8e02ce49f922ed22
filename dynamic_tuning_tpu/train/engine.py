"""Training/eval engine: jitted DyT train step with self-distillation.

Reference behavior (engine_finetune.py:16-106):
  per step: student forward (masked) + teacher forward (complete_model=True),
  4-term loss (AdaLoss CE + budget, teacher CE, KL distillation), AMP
  backward, AdamW step on the trainable params, per-iteration cosine LR.

TPU-native design:
  * The whole step — both forwards, the loss, the backward, and the optimizer
    update — is ONE jitted XLA program; gradients all-reduce over ICI
    automatically because the batch is sharded over the ``data`` mesh axis.
  * bf16 matmuls + fp32 master params replace CUDA AMP; no loss scaler is
    needed (bf16 has fp32's exponent range), so the reference's
    NativeScalerWithGradNormCount (misc.py:252-293) has no equivalent here by
    design.
  * Frozen backbone params are a separate pytree argument: no optimizer state,
    no weight-gradients computed for them.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dynamic_tuning_tpu.config import SelectConfig
from dynamic_tuning_tpu.train import losses as L
from dynamic_tuning_tpu.train.optim import merge_params

Params = Any


class TrainState(NamedTuple):
    """Everything that changes during training (a pure pytree)."""

    step: jax.Array
    trainable: Dict            # flat {path-tuple: array} of trainable params
    frozen: Dict               # flat {path-tuple: array} of frozen params
    opt_state: optax.OptState
    rng: jax.Array


def create_train_state(trainable: Dict, frozen: Dict,
                       tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      frozen=frozen, opt_state=tx.init(trainable), rng=rng)


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    select_cfg: SelectConfig,
                    distill: bool = True) -> Callable:
    """Build the jittable train step.

    apply_fn(params, images, rngs, training, complete_model) -> (logits, aux)
    """

    def loss_fn(trainable: Dict, frozen: Dict, images, labels, rngs,
                teacher_rngs):
        params = merge_params(trainable, frozen)
        student_logits, aux = apply_fn(params, images, rngs=rngs,
                                       training=True, complete_model=False)
        token_select = aux["token_select"]
        if distill:
            # Teacher: same params, mask bypassed (engine_finetune.py:49).
            # Router compute is skipped — its output is unused by the teacher
            # and receives no gradient through it, so this is numerically
            # identical to the reference and strictly cheaper.  Teacher
            # dropout masks are independent of the student's, as in the
            # reference's two sequential forwards.
            teacher_logits, _ = apply_fn(params, images, rngs=teacher_rngs,
                                         training=True, complete_model=True)
            total, parts = L.dyt_total_loss(student_logits, teacher_logits,
                                            labels, token_select, select_cfg)
        else:
            total, parts = L.ada_loss(student_logits, labels, token_select,
                                      select_cfg)
        parts["loss"] = total
        if token_select is not None:
            parts["keep_ratio"] = token_select.astype(jnp.float32).mean()
        return total, parts

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(state.rng, state.step)
        gate_rng, drop_rng, t_drop_rng = jax.random.split(step_rng, 3)
        rngs = {"gate": gate_rng, "dropout": drop_rng}
        teacher_rngs = {"dropout": t_drop_rng}

        grads, parts = jax.grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, images, labels, rngs, teacher_rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        parts["grad_norm"] = optax.global_norm(grads)
        new_state = state._replace(step=state.step + 1, trainable=trainable,
                                   opt_state=opt_state)
        return new_state, parts

    return train_step


def make_eval_step(apply_fn: Callable, dispatch: bool = False) -> Callable:
    """Eval forward: deterministic sigmoid>0.5 gate (mask-multiply form), or
    the capacity-bounded dispatch path when ``dispatch=True``.

    Returns per-example logits and the gate stack for FLOPs accounting
    (engine_finetune.py:229-248).
    """

    def eval_step(trainable: Dict, frozen: Dict, images: jax.Array
                  ) -> Tuple[jax.Array, Optional[jax.Array]]:
        params = merge_params(trainable, frozen)
        logits, aux = apply_fn(params, images, rngs=None, training=False,
                               complete_model=False, dispatch=dispatch)
        return logits, aux["token_select"]

    return eval_step


def model_apply_fn(model) -> Callable:
    """Adapt a linen model to the engine's apply signature."""

    def apply_fn(params, images, *, rngs=None, training=False,
                 complete_model=False, dispatch=False):
        variables = {"params": params}
        return model.apply(variables, images, training=training,
                           complete_model=complete_model, dispatch=dispatch,
                           rngs=rngs)

    return apply_fn
