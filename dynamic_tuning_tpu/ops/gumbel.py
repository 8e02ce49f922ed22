"""Gumbel-sigmoid gate, TPU-native.

Behavioral spec from the reference ``_gumbel_sigmoid``
(models/dynamic_adapter.py:25-54):

* training: ``y_soft = sigmoid((logits + g1 - g2) / tau)`` with
  ``g1, g2 ~ Gumbel(0, 1)`` sampled as ``-log(Exp(1))``;
* eval: ``y_soft = sigmoid(logits)`` (no noise, no tau);
* ``hard=True``: straight-through — forward emits ``1[y_soft > threshold]``,
  backward passes the soft gradient.

TPU-first notes: the difference of two independent Gumbels is exactly a
standard Logistic random variable, so we draw one ``jax.random.logistic``
sample instead of two exponentials + logs — identical distribution, half the
RNG work, fewer transcendentals on the VPU.  The straight-through trick is the
standard ``soft + stop_grad(hard - soft)`` identity, which XLA fuses into the
surrounding elementwise graph.
"""

from __future__ import annotations

import jax


def gumbel_sigmoid(
    logits: jax.Array,
    rng: jax.Array | None,
    *,
    tau: float = 1.0,
    hard: bool = False,
    threshold: float = 0.5,
    training: bool = True,
) -> jax.Array:
    """Differentiable binary gate.

    Args:
      logits: unnormalized gate scores, any shape.
      rng: PRNG key; required when ``training=True``.
      tau: temperature (reference default 5 inside TokenSelect).
      hard: straight-through hard gate.
      threshold: hard-gate threshold.
      training: draw logistic noise if True; plain sigmoid if False.

    Returns:
      Gate values in [0, 1] (soft) or {0, 1} (hard forward), same shape/dtype
      as ``logits``.
    """
    if training:
        if rng is None:
            raise ValueError("gumbel_sigmoid(training=True) requires an rng key")
        # g1 - g2 with g_i ~ Gumbel(0,1) is Logistic(0,1).
        noise = jax.random.logistic(rng, logits.shape, dtype=logits.dtype)
        y_soft = jax.nn.sigmoid((logits + noise) / tau)
    else:
        y_soft = jax.nn.sigmoid(logits)

    if hard:
        y_hard = (y_soft > threshold).astype(y_soft.dtype)
        return y_soft + jax.lax.stop_gradient(y_hard - y_soft)
    return y_soft
