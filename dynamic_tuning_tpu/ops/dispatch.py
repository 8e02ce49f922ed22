"""Capacity-bounded token dispatch — the TPU-native "speed test" path.

The reference realizes actual token-skipping savings with a data-dependent
``nonzero()`` gather (models/model_speed_test.py:243-310): keep tokens whose
``sigmoid(logit) > 0.5``, run the MLP only on those, scatter back.  Dynamic
shapes like that don't compile on TPU/XLA.

The TPU-native equivalent is an MoE-router-style **capacity-bounded dispatch**:

  * capacity K = ceil(capacity_ratio * T) rounded up to a sublane multiple
    (static — known at trace time);
  * ``jax.lax.top_k`` over router scores picks the K most-confident tokens
    (CLS is forced on with a +inf score, matching the reference's always-on
    CLS rule, dynamic_adapter.py:75);
  * static gather -> MLP on [B, K, C] -> masked scatter back.

Semantics vs the reference threshold gate: identical whenever the number of
above-threshold tokens is <= K (under-threshold tokens inside the top-K are
masked to zero); when more than K tokens pass the threshold the lowest-score
overflow tokens skip — the budget loss pins the mean keep-rate to the target,
so choosing K at (or slightly above) the target ratio reproduces accuracy.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def capacity_for(num_tokens: int, ratio: float, multiple: int = 1,
                 include_cls: bool = True) -> int:
    """Static per-block capacity: ceil(ratio * T) (+1 for CLS), rounded up to
    ``multiple``, clamped to the sequence length.

    multiple=1 is exact and free: the gathered rows flatten to (B*K, C) so
    tile alignment comes through the batch dim, and the one-hot dispatch
    contracts over K (K=99 runs the MLP on 4.8% fewer rows than the older
    sublane-rounded K=104 at ratio 0.5, T=196 — measured pure win)."""
    k = math.ceil(ratio * num_tokens) + (1 if include_cls else 0)
    return min(round_up(k, multiple), num_tokens + (1 if include_cls else 0))


def select_topk(scores: jax.Array, capacity: int, threshold: float = 0.5
                ) -> Tuple[jax.Array, jax.Array]:
    """Pick top-``capacity`` token indices per example.

    scores: [B, N] router keep-probabilities; position 0 (CLS) should already
    be +inf if it must always be kept.
    Returns (idx [B, K] int32, keep_mask [B, K] bool) where keep_mask also
    zeroes slots whose score fell at/below the threshold.
    """
    vals, idx = jax.lax.top_k(scores, capacity)
    return idx.astype(jnp.int32), vals > threshold


def gather_tokens(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x: [B, N, C], idx: [B, K] -> [B, K, C] (static-shape gather)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def scatter_tokens(template: jax.Array, idx: jax.Array, values: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Scatter masked values back into a zeros-like of ``template``.

    top_k indices are unique per row, so ``set`` (not add) is exact.
    """
    values = values * mask[..., None].astype(values.dtype)
    out = jnp.zeros_like(template)
    b = jnp.arange(template.shape[0])[:, None]
    return out.at[b, idx].set(values.astype(template.dtype))


def dispatch_mlp(x: jax.Array, scores: jax.Array, capacity: int,
                 mlp_fn: Callable[[jax.Array], jax.Array],
                 threshold: float = 0.5) -> jax.Array:
    """Run ``mlp_fn`` on only the top-``capacity`` tokens of ``x``.

    x: [B, N, C]; scores: [B, N] (CLS slot pre-forced to +inf by the caller).
    Returns the [B, N, C] MLP contribution (zeros at skipped tokens) — the
    caller adds it to the residual stream exactly like the mask-multiply form.
    """
    idx, mask = select_topk(scores, capacity, threshold)
    xg = gather_tokens(x, idx)
    yg = mlp_fn(xg)
    return scatter_tokens(x, idx, yg, mask)


def onehot_dispatch_mlp(x: jax.Array, scores: jax.Array, capacity: int,
                        mlp_fn: Callable[[jax.Array], jax.Array],
                        threshold: float = 0.5
                        ) -> Tuple[jax.Array, jax.Array]:
    """MXU-native dispatch: gather AND scatter as one-hot matmuls.

    Profiled on v5e (BENCH.md dispatch notes): memory-op gather/scatter costs
    more than the skipped-MLP savings (1583us vs 1556us full), while the
    one-hot matmul form hits the contiguous-K floor (1062us vs 1043us) — the
    dispatch permutation rides the systolic array for free.

    The threshold mask folds into the one-hot matrix: masked slots gather a
    zero row (their MLP output is discarded by the zero scatter row), so
    semantics equal the reference's sigmoid>threshold gate whenever the kept
    count fits the capacity.

    Returns (mlp_contribution [B,N,C], effective_gate [B,N]).
    """
    B, N, C = x.shape
    vals, idx = jax.lax.top_k(scores, capacity)
    keep = (vals > threshold).astype(x.dtype)
    oh = jax.nn.one_hot(idx, N, dtype=x.dtype) * keep[..., None]   # [B,K,N]
    xg = jax.lax.dot_general(oh, x, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=x.dtype)       # [B,K,C]
    yg = mlp_fn(xg)
    out = jax.lax.dot_general(oh, yg.astype(x.dtype),
                              (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=x.dtype)      # [B,N,C]
    gate = oh.sum(axis=1)                                          # [B,N] 0/1
    return out, gate
