"""Checkpoint IO: timm ``.pth`` import + native save/resume.

Reference behavior:
  * Pretrained load with head-surgery (shape-mismatched ``head.*`` removed),
    ``pre_logits`` removal, strict=False; the *missing* keys define which
    params stay trainable (main_image.py:219-256).
  * Save {model, optimizer, epoch, scaler, args} per epoch / on best metric,
    rank-0 only, with ``auto_remove`` pruning (misc.py:296-352); final weights
    as ``final_checkpoint.pth`` (main_image.py:357-358).

TPU-native: our format is msgpack pytrees (flax.serialization) — no pickle,
host-portable, restores under any mesh because params are replicated/resharded
at load.  torch is used only to *read* legacy ``.pth`` files on CPU.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization, traverse_util

from dynamic_tuning_tpu.utils.pos_embed import interpolate_pos_embed

Params = Any


# ---------------------------------------------------------------------------
# timm / torch .pth import
# ---------------------------------------------------------------------------

def _torch_key_to_flax(key: str) -> Optional[Tuple[str, ...]]:
    """Map a timm ViT state-dict key to our flax param path.

    Layout notes: torch Linear weights are [out, in] -> flax kernels [in, out]
    (transpose); torch conv weights are OIHW -> flax HWIO.
    """
    if key.startswith("pre_logits."):
        return None  # dropped (main_image.py:237-240)
    k = key
    m = re.match(r"blocks\.(\d+)\.(.*)", k)
    prefix: Tuple[str, ...] = ()
    if m:
        prefix = (f"blocks_{m.group(1)}",)
        k = m.group(2)

    table = {
        "cls_token": ("cls_token",),
        "pos_embed": ("pos_embed",),
        "patch_embed.proj.weight": ("patch_embed", "proj", "kernel"),
        "patch_embed.proj.bias": ("patch_embed", "proj", "bias"),
        "norm.weight": ("norm", "scale"),
        "norm.bias": ("norm", "bias"),
        "head.weight": ("head", "kernel"),
        "head.bias": ("head", "bias"),
        # inside a block:
        "norm1.weight": ("norm1", "scale"),
        "norm1.bias": ("norm1", "bias"),
        "norm2.weight": ("norm2", "scale"),
        "norm2.bias": ("norm2", "bias"),
        "attn.qkv.weight": ("attn", "qkv", "kernel"),
        "attn.qkv.bias": ("attn", "qkv", "bias"),
        "attn.proj.weight": ("attn", "proj", "kernel"),
        "attn.proj.bias": ("attn", "proj", "bias"),
        "mlp.fc1.weight": ("mlp", "fc1", "kernel"),
        "mlp.fc1.bias": ("mlp", "fc1", "bias"),
        "mlp.fc2.weight": ("mlp", "fc2", "kernel"),
        "mlp.fc2.bias": ("mlp", "fc2", "bias"),
        # DyT params (present when importing a reference-finetuned ckpt):
        "adaptmlp.down_proj.weight": ("adaptmlp", "down_proj", "kernel"),
        "adaptmlp.down_proj.bias": ("adaptmlp", "down_proj", "bias"),
        "adaptmlp.up_proj.weight": ("adaptmlp", "up_proj", "kernel"),
        "adaptmlp.up_proj.bias": ("adaptmlp", "up_proj", "bias"),
        "mlp_token_select.mlp_head.weight": ("mlp_token_select", "mlp_head", "kernel"),
        "mlp_token_select.mlp_head.bias": ("mlp_token_select", "mlp_head", "bias"),
    }
    if k in table:
        return prefix + table[k]
    return ("__unexpected__", key)


def _convert_tensor(path: Tuple[str, ...], w: np.ndarray) -> np.ndarray:
    if path[-1] == "kernel":
        if w.ndim == 2:
            return np.ascontiguousarray(w.T)            # [out,in] -> [in,out]
        if w.ndim == 4:
            return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW->HWIO
        if w.ndim == 5:
            # torch Conv3d OIDHW -> flax DHWIO (VideoMAE tubelet patch stem)
            return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))
    if path[0] == "cls_token" or path[0] == "pos_embed":
        return w
    return w


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # CPU-only reader for legacy checkpoints

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def import_pretrained(params: Params, state_dict: Dict[str, np.ndarray],
                      logger=None, num_prefix_tokens: int = 1
                      ) -> Tuple[Params, List[Tuple[str, ...]]]:
    """Merge a torch/timm state dict into a flax param tree.

    Performs head surgery (shape-mismatched head removed, reference
    main_image.py:230-235), pre_logits removal, and pos-embed grid
    interpolation.  Returns (new_params, missing_keys) where missing_keys are
    the flax paths NOT found in the checkpoint — the reference's freeze rule
    keeps exactly those trainable (main_image.py:249-256).
    """
    log = logger.info if logger else print
    flat = traverse_util.flatten_dict(params)
    new_flat = dict(flat)
    loaded = set()
    unexpected = []

    for tkey, w in state_dict.items():
        path = _torch_key_to_flax(tkey)
        if path is None:
            log(f"Removing key {tkey} from pretrained checkpoint (pre_logits)")
            continue
        if path[0] == "__unexpected__" or path not in flat:
            unexpected.append(tkey)
            continue
        w = _convert_tensor(path, np.asarray(w))
        target_shape = flat[path].shape
        if path == ("pos_embed",) and w.shape != target_shape:
            log(f"Interpolating pos_embed {w.shape} -> {target_shape}")
            w = interpolate_pos_embed(w, target_shape[1] - num_prefix_tokens,
                                      num_prefix_tokens)
        if w.shape != tuple(target_shape):
            if path[0] == "head":
                log(f"Removing key {tkey} from pretrained checkpoint "
                    f"(shape {w.shape} != {tuple(target_shape)})")
                continue
            raise ValueError(f"shape mismatch for {path}: ckpt {w.shape} "
                             f"vs model {tuple(target_shape)}")
        new_flat[path] = jnp.asarray(w, dtype=flat[path].dtype)
        loaded.add(path)

    missing = [p for p in flat if p not in loaded]
    if unexpected:
        log(f"unexpected keys (ignored): {unexpected[:8]}"
            + (" ..." if len(unexpected) > 8 else ""))
    log(f"loaded {len(loaded)} tensors; {len(missing)} missing "
        f"(stay trainable): {sorted({p[-2] for p in missing if len(p) > 1})}")
    return traverse_util.unflatten_dict(new_flat), missing


def reinit_head(params: Params, rng: jax.Array, std: float = 0.01) -> Params:
    """trunc_normal_(head.weight, std=0.01) after pretrained load
    (reference main_image.py:247)."""
    flat = traverse_util.flatten_dict(params)
    k = ("head", "kernel")
    if k in flat:
        flat[k] = std * jax.random.truncated_normal(
            rng, -2.0, 2.0, flat[k].shape, jnp.float32)
        flat[("head", "bias")] = jnp.zeros_like(flat[("head", "bias")])
    return traverse_util.unflatten_dict(flat)


# ---------------------------------------------------------------------------
# native save / resume (msgpack pytrees)
# ---------------------------------------------------------------------------

def _to_pure(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


_ASYNC_SAVER: Optional[object] = None
_ATEXIT_REGISTERED = False


def save_checkpoint(output_dir: str, state, epoch: int, *,
                    tag: Optional[str] = None, extra: Optional[dict] = None,
                    auto_remove: bool = False, is_main: bool = True,
                    blocking: bool = True, backend: str = "msgpack") -> str:
    """Write {trainable, frozen, opt_state, step, epoch} as one msgpack blob.

    Mirrors misc.save_model (misc.py:296-311) incl. auto_remove pruning
    (misc.py:316-329).  Only the main process writes.  ``blocking=False``
    snapshots device arrays to host immediately and serializes + writes on a
    background thread (training continues during IO).
    ``backend="orbax"`` switches to the async sharded orbax path (all
    processes participate; is_main/blocking are handled by orbax itself).
    """
    if backend == "orbax":
        return save_checkpoint_orbax(output_dir, state, epoch, extra=extra,
                                     auto_remove=auto_remove)
    if not is_main:
        return ""
    os.makedirs(output_dir, exist_ok=True)
    name = tag or f"checkpoint-{epoch}"
    path = os.path.join(output_dir, f"{name}.msgpack")
    payload = {
        "trainable": _nested(_to_pure(state.trainable)),
        "frozen": _nested(_to_pure(state.frozen)),
        "opt_state": serialization.to_state_dict(_to_pure(state.opt_state)),
        "step": int(state.step),
        "epoch": int(epoch),
        "extra": extra or {},
    }

    def write():
        # temp-file + rename: a crash mid-write never leaves a truncated
        # checkpoint under the final name
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        os.replace(tmp, path)
        if auto_remove and tag is None:
            for old in sorted(glob.glob(
                    os.path.join(output_dir, "checkpoint-*.msgpack"))):
                m = re.search(r"checkpoint-(\d+)\.msgpack$", old)
                if m and int(m.group(1)) < epoch:
                    os.remove(old)

    if blocking:
        write()
    else:
        import atexit
        import threading
        global _ASYNC_SAVER, _ATEXIT_REGISTERED
        if _ASYNC_SAVER is not None:
            _ASYNC_SAVER.join()           # at most one in-flight save
        if not _ATEXIT_REGISTERED:
            # never exit with a half-written final save in flight
            atexit.register(wait_for_async_saves)
            _ATEXIT_REGISTERED = True
        _ASYNC_SAVER = threading.Thread(target=write, daemon=True)
        _ASYNC_SAVER.start()
    return path


def save_aux_state(output_dir: str, name: str, tree, step: int, *,
                   auto_remove: bool = False, is_main: bool = True) -> str:
    """Sidecar pytree saved next to a checkpoint — for mutable collections
    that live outside the TrainState, e.g. the SyncBN ``batch_stats`` of the
    segmentation runner (reference mmseg checkpoints carry BN buffers inside
    the state dict; our TrainState is params+opt only).  Replicated
    collections are written by the main process alone."""
    if not is_main or not tree:
        return ""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"aux-{name}-{step}.msgpack")
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_pure(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if auto_remove:
        for old in glob.glob(os.path.join(output_dir, f"aux-{name}-*.msgpack")):
            m = re.search(rf"aux-{re.escape(name)}-(\d+)\.msgpack$", old)
            if m and int(m.group(1)) < step:
                os.remove(old)
    return path


def load_aux_state(output_dir: str, name: str, template,
                   step: Optional[int] = None):
    """Restore the latest (or given-step) sidecar saved by save_aux_state
    into ``template``'s structure; returns template unchanged when no
    sidecar exists (e.g. resuming a GroupNorm run)."""
    pat = os.path.join(output_dir, f"aux-{name}-*.msgpack")
    found = {}
    for p in glob.glob(pat):
        m = re.search(rf"aux-{re.escape(name)}-(\d+)\.msgpack$", p)
        if m:
            found[int(m.group(1))] = p
    if not found:
        return template
    pick = step if step in found else max(found)
    with open(found[pick], "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(template, restored)


def wait_for_async_saves():
    """Block until an in-flight non-blocking save finishes."""
    global _ASYNC_SAVER
    if _ASYNC_SAVER is not None:
        _ASYNC_SAVER.join()
        _ASYNC_SAVER = None
    for mgr in _ORBAX_MANAGERS.values():
        mgr.wait_until_finished()


# --- orbax backend (pod-scale sharded async checkpointing) --------------------
#
# The msgpack path gathers everything to host rank 0 — right for the
# reference's single-host save_on_master contract (misc.py:212-214) and for
# portability.  The orbax backend writes each host's addressable shards
# directly with async IO, which is the TPU-native choice for multi-pod runs
# (ROADMAP "remote/multi-pod checkpointing via orbax with async save").

_ORBAX_MANAGERS: Dict[tuple, object] = {}   # (abs dir, max_to_keep) -> mgr


def _orbax_manager(output_dir: str, max_to_keep: Optional[int]):
    import orbax.checkpoint as ocp

    root = os.path.abspath(output_dir)
    # Key on the retention policy too: a manager created by a resume-time
    # load (max_to_keep=None) must not silently disable auto_remove pruning
    # for later saves into the same directory.
    key = (root, max_to_keep)
    if key not in _ORBAX_MANAGERS:
        stale = [k for k in _ORBAX_MANAGERS if k[0] == root and k != key]
        for k in stale:  # one live manager per dir: drain then drop the other
            mgr = _ORBAX_MANAGERS.pop(k)
            mgr.wait_until_finished()
            mgr.close()   # release the async-checkpointing executor too
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=True)
        _ORBAX_MANAGERS[key] = ocp.CheckpointManager(root, options=options)
    return _ORBAX_MANAGERS[key]


def save_checkpoint_orbax(output_dir: str, state, epoch: int, *,
                          extra: Optional[dict] = None,
                          auto_remove: bool = False) -> str:
    """Async sharded save via orbax: every process participates (each host
    writes its addressable shards); returns after IO is dispatched."""
    mgr = _orbax_manager(output_dir, 1 if auto_remove else None)
    import orbax.checkpoint as ocp

    mgr.save(epoch, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        extra=ocp.args.JsonSave({k: float(v) for k, v
                                 in (extra or {}).items()})))
    return os.path.join(os.path.abspath(output_dir), str(epoch))


def load_checkpoint_orbax(output_dir: str, state, step: Optional[int] = None):
    """Restore the latest (or given) orbax step into ``state``'s structure."""
    mgr = _orbax_manager(output_dir, None)
    import orbax.checkpoint as ocp

    step = mgr.latest_step() if step is None else step
    restored = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(state),
        extra=ocp.args.JsonRestore()))
    return restored["state"], int(step), dict(restored["extra"] or {})


def load_checkpoint(path: str, state):
    """Restore a TrainState saved by save_checkpoint (reference
    misc.load_model, misc.py:332-352: restores optimizer/epoch too).
    A directory path is treated as an orbax checkpoint root."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path, state)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    trainable = _flat(payload["trainable"])
    frozen = _flat(payload["frozen"])
    opt_state = serialization.from_state_dict(state.opt_state, payload["opt_state"])
    new_state = state._replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        trainable={k: jnp.asarray(v) for k, v in trainable.items()},
        frozen={k: jnp.asarray(v) for k, v in frozen.items()},
        opt_state=jax.tree_util.tree_map(jnp.asarray, opt_state),
    )
    return new_state, int(payload["epoch"]), payload.get("extra", {})


def save_params(path: str, params: Params):
    """Final weights export (reference final_checkpoint.pth,
    main_image.py:357-358)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_nested(_to_pure(params))))


def load_params(path: str) -> Params:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# ---------------------------------------------------------------------------
# torch .pth export (cross-framework compat)
# ---------------------------------------------------------------------------

def _flax_path_to_torch(path: Tuple[str, ...]) -> Optional[str]:
    """Inverse of _torch_key_to_flax for the ViT param tree."""
    parts = list(path)
    prefix = ""
    if parts[0].startswith("blocks_"):
        prefix = f"blocks.{parts[0].split('_')[1]}."
        parts = parts[1:]
    inv = {
        ("cls_token",): "cls_token",
        ("pos_embed",): "pos_embed",
        ("patch_embed", "proj", "kernel"): "patch_embed.proj.weight",
        ("patch_embed", "proj", "bias"): "patch_embed.proj.bias",
        ("norm", "scale"): "norm.weight",
        ("norm", "bias"): "norm.bias",
        ("head", "kernel"): "head.weight",
        ("head", "bias"): "head.bias",
        ("norm1", "scale"): "norm1.weight",
        ("norm1", "bias"): "norm1.bias",
        ("norm2", "scale"): "norm2.weight",
        ("norm2", "bias"): "norm2.bias",
        ("attn", "qkv", "kernel"): "attn.qkv.weight",
        ("attn", "qkv", "bias"): "attn.qkv.bias",
        ("attn", "proj", "kernel"): "attn.proj.weight",
        ("attn", "proj", "bias"): "attn.proj.bias",
        ("mlp", "fc1", "kernel"): "mlp.fc1.weight",
        ("mlp", "fc1", "bias"): "mlp.fc1.bias",
        ("mlp", "fc2", "kernel"): "mlp.fc2.weight",
        ("mlp", "fc2", "bias"): "mlp.fc2.bias",
        ("adaptmlp", "down_proj", "kernel"): "adaptmlp.down_proj.weight",
        ("adaptmlp", "down_proj", "bias"): "adaptmlp.down_proj.bias",
        ("adaptmlp", "up_proj", "kernel"): "adaptmlp.up_proj.weight",
        ("adaptmlp", "up_proj", "bias"): "adaptmlp.up_proj.bias",
        ("mlp_token_select", "mlp_head", "kernel"):
            "mlp_token_select.mlp_head.weight",
        ("mlp_token_select", "mlp_head", "bias"):
            "mlp_token_select.mlp_head.bias",
    }
    key = inv.get(tuple(parts))
    return prefix + key if key else None


def export_torch_state_dict(params: Params, path: str) -> int:
    """Write the param tree as a reference-layout torch ``.pth`` so checkpoints
    round-trip between the frameworks (kernels transposed back to [out, in],
    conv back to OIHW).  Returns the number of exported tensors."""
    import torch

    flat = traverse_util.flatten_dict(params)
    sd = {}
    for p, w in flat.items():
        tkey = _flax_path_to_torch(p)
        if tkey is None:
            continue
        w = np.asarray(w)
        if p[-1] == "kernel":
            if w.ndim == 2:
                w = np.ascontiguousarray(w.T)
            elif w.ndim == 4:
                w = np.ascontiguousarray(w.transpose(3, 2, 0, 1))  # HWIO->OIHW
            elif w.ndim == 5:
                # tubelet Conv3d: DHWIO -> OIDHW (inverse of _convert_tensor)
                w = np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))
        sd[tkey] = torch.tensor(w)
    torch.save({"model": sd}, path)
    return len(sd)


def _nested(flat_or_tree):
    if isinstance(flat_or_tree, dict) and flat_or_tree and \
            isinstance(next(iter(flat_or_tree)), tuple):
        return traverse_util.unflatten_dict(flat_or_tree)
    return flat_or_tree


def _flat(tree):
    if isinstance(tree, dict):
        flat = traverse_util.flatten_dict(tree)
        return flat
    return tree
