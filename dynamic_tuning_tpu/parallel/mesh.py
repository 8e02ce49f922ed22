"""Device mesh + sharding rules.

The reference's only parallel strategy is DDP data-parallelism over NCCL
(main_image.py:280-282, misc.py:243).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: the batch is sharded over it and
XLA inserts the gradient all-reduce over ICI automatically under ``jit``.
We additionally expose a ``model`` axis with megatron-style column/row param
shardings for the ViT matmuls, so the same code scales tensor-parallel when a
bigger backbone needs it (ViT-B itself runs DP-only, model_parallel=1).
"""

from __future__ import annotations

import math
import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# Megatron-style tensor-parallel rules for the ViT param tree.  Column-parallel
# (shard output features) for qkv / mlp fc1 / adapter down; row-parallel (shard
# input features) for proj / fc2 / adapter up; everything else replicated.
_TP_RULES = [
    (r".*attn.*qkv.*kernel", P(None, MODEL_AXIS)),
    (r".*attn.*proj.*kernel", P(MODEL_AXIS, None)),
    (r".*mlp.*fc1.*kernel", P(None, MODEL_AXIS)),
    (r".*mlp.*fc2.*kernel", P(MODEL_AXIS, None)),
    (r".*adaptmlp.*down_proj.*kernel", P(None, MODEL_AXIS)),
    (r".*adaptmlp.*up_proj.*kernel", P(MODEL_AXIS, None)),
    (r".*attn.*qkv.*bias", P(MODEL_AXIS)),
    (r".*mlp.*fc1.*bias", P(MODEL_AXIS)),
    (r".*adaptmlp.*down_proj.*bias", P(MODEL_AXIS)),
]


def param_spec(path: str, shape: tuple,
               model_parallel: Optional[int] = None) -> P:
    """TP rule lookup for one param leaf.

    When ``model_parallel`` is given, a matched spec whose sharded dimension
    is out of range or doesn't divide by it falls back to replication —
    tiny dims (bottleneck=8..64) may not divide; replicate those."""
    for pat, spec in _TP_RULES:
        if re.fullmatch(pat, path):
            if model_parallel is not None:
                for dim, axis in enumerate(spec):
                    if axis is not None and (dim >= len(shape)
                                             or shape[dim] % model_parallel):
                        return P()
            return spec
    return P()


def param_shardings(mesh: Mesh, params: Params) -> Params:
    """NamedSharding tree matching the param tree."""
    tp = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        pathstr = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, param_spec(pathstr, leaf.shape, tp))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded along the leading axis.

    Single process: plain device_put.  Multi-process (the reference's
    multi-node DDP mode, misc.py:217-249): every process holds a *different*
    local batch, so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — global batch =
    local_batch * process_count, each host contributing its own data.  A
    plain device_put here would silently drop all but the addressable slice
    of each host's batch.

    Single-process leaves whose batch dim doesn't divide the data axis are
    replicated (tiny-batch smoke runs, remainder batches)."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    dp = mesh.shape[DATA_AXIS]
    pc = jax.process_count()

    def put(x):
        if pc > 1:
            import numpy as np_

            if x.ndim == 0:
                return jax.device_put(x, rep)
            if (x.shape[0] * pc) % dp != 0:
                raise ValueError(
                    f"per-process batch {x.shape[0]} x {pc} processes not "
                    f"divisible by data axis {dp}; pad the loader shard")
            return jax.make_array_from_process_local_data(sh, np_.asarray(x))
        ok = x.ndim > 0 and x.shape[0] % dp == 0
        return jax.device_put(x, sh if ok else rep)

    return jax.tree_util.tree_map(put, batch)


def eval_pad_count(mesh: Mesh, n_items: int, rows_per_item: int = 1) -> int:
    """Items to append to a per-process eval batch so ``shard_batch``
    accepts its flattened rows in multi-process mode.

    Multi-process ``shard_batch`` needs (rows * processes) divisible by the
    data axis; train loaders guarantee it via drop_last, but eval tail
    batches don't (review finding: a 68-row tail over 32 devices x 4
    processes aborted evaluation).  Callers pad items (label sentinel -1)
    and drop the padded rows after ``host_local_rows`` readback.  Every
    process sees the same tail size (the loader pads shards to equal
    length), so the padded shapes stay lockstep across hosts."""
    if jax.process_count() <= 1:
        return 0  # single process replicates non-dividing leaves instead
    per = rows_per_item * jax.process_count()
    dp = mesh.shape[DATA_AXIS]
    m = dp // math.gcd(dp, per)
    return (-n_items) % m


def pad_eval_batch(mesh: Mesh, items: "np.ndarray", labels,
                   rows_per_item: int = 1) -> Tuple["np.ndarray", "np.ndarray"]:
    """Pad a per-process eval batch per ``eval_pad_count``: repeat the last
    item, append sentinel ``-1`` labels (always int64 so the sentinel can't
    wrap on unsigned label dtypes).  After ``host_local_rows`` readback,
    callers drop rows where the label is negative."""
    labels = np.asarray(labels).astype(np.int64)
    pad = eval_pad_count(mesh, len(labels), rows_per_item)
    if pad:
        items = np.concatenate([items, np.repeat(items[-1:], pad, axis=0)])
        labels = np.concatenate([labels, np.full(pad, -1, np.int64)])
    return items, labels


def localize_tree(tree, device: Optional[jax.Device] = None):
    """Full host-local copy of a (possibly globally-sharded) pytree, placed
    on one local device.

    Enables per-process eval loops whose jit-launch counts differ across
    hosts — e.g. segmentation slide inference, where each process evaluates
    different-sized images with size-dependent tile counts.  Running those
    against global-mesh-sharded params would require lockstep launches on
    every host (divergence deadlocks inside the collectives); localizing
    the params once makes each launch a purely process-local program.

    Replicated leaves read back for free from a local shard; genuinely
    sharded leaves are allgathered via one jitted identity with replicated
    out-sharding (all processes must call this function together)."""
    device = device or jax.local_devices()[0]
    leaves, treedef = jax.tree_util.tree_flatten(tree)

    def needs_gather(x):
        return (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.sharding.is_fully_replicated)

    gather = [x for x in leaves if needs_gather(x)]
    if gather:
        mesh0 = gather[0].sharding.mesh
        rep = jax.jit(lambda xs: xs,
                      out_shardings=NamedSharding(mesh0, P()))(gather)
        gathered = iter(rep)
    out = []
    for x in leaves:
        if needs_gather(x):
            x = next(gathered)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = np.asarray(x.addressable_shards[0].data)
        out.append(jax.device_put(x, device))
    return jax.tree_util.tree_unflatten(treedef, out)


def host_local_rows(x) -> "np.ndarray":
    """Materialize the caller-process's rows of a batch-sharded array.

    Single process (fully addressable): plain np.asarray.  Multi-process:
    ``np.asarray`` on a cross-process-sharded array raises, so concatenate
    this host's addressable shards in index order instead — the host-local
    counterpart of ``shard_batch``.  Pairing between two arrays produced
    under the same sharding (e.g. eval logits and labels) is preserved
    because both expose their shards in the same order."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    # dedup replicas (a model-parallel axis replicates each row shard) and
    # order by global row offset.  Dedup-by-row is only sound when every
    # shard of a row carries the FULL row (replicated non-batch dims): if
    # the compiler left a non-batch axis genuinely sharded, dropping the
    # "duplicates" would silently discard columns — fail loud instead.
    seen = {}
    for s in x.addressable_shards:
        key = s.index[0].start or 0
        if key not in seen:
            seen[key] = (np.asarray(s.data), s.index[1:])
        elif seen[key][1] != s.index[1:]:
            raise ValueError(
                f"host_local_rows: array is sharded along a non-batch axis "
                f"(row {key}: {seen[key][1]} vs {s.index[1:]}); gather it "
                f"(e.g. jax.lax.with_sharding_constraint to batch-only) "
                f"before host readback")
    return np.concatenate([seen[k][0] for k in sorted(seen)])


def _path_to_spec(mesh: Mesh, path, shape) -> P:
    """Derive a PartitionSpec for any TrainState leaf from its pytree path.

    Param leaves live under flat-dict keys that are *tuples* of names
    (trainable/frozen and the optimizer's mu/nu mirrors); everything else
    (step counts, rng) is replicated."""
    tp = mesh.shape[MODEL_AXIS]
    for k in path:
        key = getattr(k, "key", None)
        if isinstance(key, tuple):
            return param_spec("/".join(str(x) for x in key), shape, tp)
    return P()


def state_shardings(mesh: Mesh, state_shape) -> Any:
    """Sharding pytree matching a TrainState (from jax.eval_shape)."""

    def one(path, leaf):
        return NamedSharding(mesh, _path_to_spec(mesh, path, leaf.shape))

    return jax.tree_util.tree_map_with_path(one, state_shape)


def shard_state(mesh: Mesh, state) -> Any:
    """Place an already-materialized TrainState onto the mesh."""
    shardings = state_shardings(mesh, jax.eval_shape(lambda: state))
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
