"""Segmentation training runner (iter-based, poly LR).

Reference recipe (configs/beit/upernet/our_vit.py + mmcv_custom/train_api.py):
AdamW lr 1e-3 wd 0.05, poly power 1.0 with 1500-iter linear warmup, 160k
iters, batch 2/process, crop 512; eval mIoU by slide inference (crop 512 /
stride 341) every ``eval_interval`` iters.  The token budget loss rides inside
the total loss (encoder_decoder.py:139-142)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_tuning_tpu.config import RunConfig
from dynamic_tuning_tpu.data.loader import DataLoader
from dynamic_tuning_tpu.data.segmentation import build_seg_dataset, seg_normalize
from dynamic_tuning_tpu.models.upernet import DyTSegmentor, seg_loss, slide_inference
from dynamic_tuning_tpu.parallel import mesh as M
from dynamic_tuning_tpu.train import checkpoint as C
from dynamic_tuning_tpu.train.engine import TrainState, create_train_state
from dynamic_tuning_tpu.train.optim import (count_params, merge_params,
                                            partition_params)
from dynamic_tuning_tpu.utils.logger import create_logger
from dynamic_tuning_tpu.utils.meters import MetricLogger
from dynamic_tuning_tpu.utils.metrics import confusion_matrix, miou_from_confusion


def poly_schedule(base_lr: float, total_iters: int, warmup_iters: int = 1500,
                  warmup_ratio: float = 1e-6, power: float = 1.0,
                  min_lr: float = 0.0):
    def sched(step):
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio)
                          * step / max(warmup_iters, 1))
        prog = jnp.clip(step / max(total_iters, 1), 0.0, 1.0)
        poly = (base_lr - min_lr) * (1 - prog) ** power + min_lr
        return jnp.where(step < warmup_iters, warm, poly)

    return sched


def seg_trainable_predicate(path):
    """Freeze rule for segmentation: backbone pretrained weights frozen;
    adapters, routers, rel-pos tables, FPN necks and both heads train
    (the reference freezes all-but-missing, seg_train.py:226-230 — the FPN,
    heads, rel-pos tables and DyT params are exactly the missing set)."""
    if path[0] in ("decode_head", "auxiliary_head"):
        return True
    if any(k in path for k in ("adaptmlp", "mlp_token_select",
                               "relative_position_bias_table")):
        return True
    if len(path) > 1 and path[1].startswith("fpn"):
        return True
    return False


class SegRunner:
    def __init__(self, cfg: RunConfig, *, total_iters: int = 160_000,
                 eval_interval: int = 16_000, crop: int = 512,
                 slide_stride: int = 341, norm: str = "gn",
                 head_channels: int = 0, tile_batch: int = 1):
        self.cfg = cfg
        self.norm = norm
        self.head_channels = head_channels or None
        self.total_iters = total_iters
        self.eval_interval = eval_interval
        self.crop = crop
        self.slide_stride = slide_stride
        self.tile_batch = tile_batch
        self.logger = create_logger(cfg.output_dir, jax.process_index())
        self.mesh = M.make_mesh(cfg.mesh.model_parallel)
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        train_ds, val_ds, nc = build_seg_dataset(cfg.data.dataset,
                                                 cfg.data.data_path, crop)
        self.num_classes = nc
        self.train_loader = DataLoader(
            train_ds, cfg.data.batch_size, shuffle=True, drop_last=True,
            seed=cfg.seed, num_workers=cfg.data.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())
        self.val_ds = val_ds

        self.model = DyTSegmentor(cfg.model, num_classes=nc,
                                  tuning=cfg.tuning, select=cfg.select,
                                  norm=norm, head_channels=self.head_channels,
                                  dtype=self.dtype)
        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((1, crop, crop, 3))
        variables = self.model.init(rng, sample)
        params = variables["params"]
        # SyncBN running stats (empty dict for the stateless GroupNorm path)
        self.batch_stats = variables.get("batch_stats", {})

        if cfg.finetune:
            if cfg.finetune.endswith((".pth", ".pt")):
                sd = C.load_torch_state_dict(cfg.finetune)
                # backbone prefix remap (reference seg_train.py:216-221)
                bb = params["backbone"]
                bb, _ = C.import_pretrained(bb, sd, self.logger)
                params = {**params, "backbone": bb}
            else:
                params = C.load_params(cfg.finetune)

        trainable, frozen = partition_params(params, seg_trainable_predicate)
        self.logger.info(f"seg trainable (M): {count_params(trainable, False) / 1e6:.2f}")

        sched = poly_schedule(cfg.optim.lr or 1e-3, total_iters)
        # honor the CLI optim knobs (reference seg config: AdamW wd 0.05,
        # configs/beit/upernet/our_vit.py — kept as the config default)
        tx = optax.adamw(sched, weight_decay=cfg.optim.weight_decay)
        self.tx = (optax.chain(optax.clip_by_global_norm(cfg.optim.clip_grad),
                               tx)
                   if cfg.optim.clip_grad is not None else tx)
        state = create_train_state(trainable, frozen, self.tx,
                                   jax.random.fold_in(rng, 1))
        self.state = M.shard_state(self.mesh, state)
        self.start_iter = 0
        self.max_miou = 0.0
        if cfg.resume:
            self.state, last, extra = C.load_checkpoint(cfg.resume, self.state)
            # restored arrays are host-local: re-lay them out on the mesh
            self.state = M.shard_state(self.mesh, self.state)
            self.start_iter = int(self.state.step)
            # checkpoints save only on improvement -> stored miou is the
            # best-so-far (prevents auto_remove from pruning the true best
            # after the first post-resume eval)
            self.max_miou = float(extra.get("miou", 0.0))
            if self.batch_stats:
                # SyncBN running stats live outside the TrainState; restore
                # the sidecar or eval would normalize with init stats
                root = (cfg.resume if os.path.isdir(cfg.resume)
                        else os.path.dirname(cfg.resume) or ".")
                self.batch_stats = C.load_aux_state(root, "batch_stats",
                                                    self.batch_stats)

        self.train_step = jax.jit(self._make_train_step(), donate_argnums=(0,))
        self._eval_apply = jax.jit(self._make_eval_apply())

    def _make_train_step(self):
        model, tx = self.model, self.tx
        has_bn = bool(self.batch_stats)

        def loss_fn(trainable, frozen, bstats, images, labels, rngs):
            params = merge_params(trainable, frozen)
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = bstats
                (logits, aux_logits, aux), mutated = model.apply(
                    variables, images, training=True, rngs=rngs,
                    mutable=["batch_stats"])
                new_bstats = mutated["batch_stats"]
            else:
                logits, aux_logits, aux = model.apply(
                    variables, images, training=True, rngs=rngs)
                new_bstats = bstats
            total, parts = seg_loss(logits, aux_logits, labels, aux["loss"])
            parts["loss"] = total
            if aux["token_select"] is not None:
                parts["keep_ratio"] = aux["token_select"].astype(jnp.float32).mean()
            return total, (parts, new_bstats)

        def step(state: TrainState, bstats, images, labels):
            r = jax.random.fold_in(state.rng, state.step)
            g, d = jax.random.split(r)
            grads, (parts, bstats) = jax.grad(loss_fn, has_aux=True)(
                state.trainable, state.frozen, bstats, images, labels,
                {"gate": g, "dropout": d})
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            return state._replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state), bstats, parts

        return step

    def _make_eval_apply(self):
        model = self.model

        def apply_fn(variables, tile):
            logits, _, _ = model.apply(variables, tile, training=False)
            return logits

        return apply_fn

    def _eval_variables(self):
        v = {"params": merge_params(self.state.trainable, self.state.frozen)}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def load_eval_checkpoint(self, path: str):
        """Load weights for --eval_ckpt evaluation (no optimizer resume);
        restores the SyncBN sidecar too (see the resume path above)."""
        self.state, _, _ = C.load_checkpoint(path, self.state)
        self.state = M.shard_state(self.mesh, self.state)
        if self.batch_stats:
            root = path if os.path.isdir(path) else os.path.dirname(path) or "."
            self.batch_stats = C.load_aux_state(root, "batch_stats",
                                                self.batch_stats)

    def evaluate(self, max_images: int | None = None) -> Dict[str, float]:
        params = self._eval_variables()
        if jax.process_count() > 1:
            # Each process evaluates a DIFFERENT subset of different-sized
            # images, so slide-tile jit-launch counts diverge across hosts.
            # Against mesh-sharded params every launch is a global program
            # (divergence deadlocks); localize the params once per eval so
            # each launch is purely process-local (review finding).  The
            # final confusion-matrix allgather below is the only collective.
            params = M.localize_tree(params)
        cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        n = len(self.val_ds) if max_images is None else min(max_images,
                                                            len(self.val_ds))
        for i in range(jax.process_index(), n, jax.process_count()):
            img, ann = self.val_ds[i]
            ann = np.asarray(ann)
            x = seg_normalize(jnp.asarray(img))
            logits = slide_inference(self._eval_apply, params, x,
                                     num_classes=self.num_classes,
                                     crop=self.crop, stride=self.slide_stride,
                                     tile_batch=self.tile_batch)
            if logits.shape[:2] != ann.shape:
                # mmseg protocol: resize predictions back to the ORIGINAL
                # GT resolution (bilinear on logits, then argmax) — never
                # downscale the GT (encoder_decoder.py slide_inference +
                # resize(..., size=ori_shape))
                logits = jax.image.resize(
                    logits, (ann.shape[0], ann.shape[1], logits.shape[-1]),
                    method="bilinear")
            pred = np.asarray(jnp.argmax(logits, -1))
            cm += confusion_matrix(pred, ann, self.num_classes)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            cm = np.asarray(multihost_utils.process_allgather(cm)).sum(0)
        miou, per_class = miou_from_confusion(cm)
        acc = float(np.diag(cm).sum() / max(cm.sum(), 1) * 100)
        stats = {"miou": miou, "aAcc": acc, "metric": miou}
        self.logger.info("seg eval: " + json.dumps(
            {k: round(float(v), 4) for k, v in stats.items()}))
        return stats

    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        ml = MetricLogger(logger=self.logger)
        it = self.start_iter
        max_miou, t0 = self.max_miou, time.time()
        epoch = 0
        pending = None
        while it < self.total_iters:
            self.train_loader.set_epoch(epoch)
            for imgs, anns in self.train_loader:
                xb = seg_normalize(jnp.asarray(imgs))
                yb = jnp.asarray(anns.astype(np.int32))
                xb, yb = M.shard_batch(self.mesh, (xb, yb))
                self.state, self.batch_stats, parts = self.train_step(
                    self.state, self.batch_stats, xb, yb)
                # flush the PREVIOUS iter's scalars so one step stays in
                # flight (see Runner.train_one_epoch); the iter-50 log line
                # runs one step stale, eval/checkpoint boundaries are exact
                if pending is not None:
                    ml.update(**{k: float(v) for k, v in pending.items()})
                pending = parts
                it += 1
                if it % 50 == 0:
                    self.logger.info(f"iter {it}/{self.total_iters} {ml}")
                if it % self.eval_interval == 0 or it == self.total_iters:
                    ml.update(**{k: float(v) for k, v in pending.items()})
                    pending = None
                    stats = self.evaluate()
                    if cfg.output_dir and stats["metric"] >= max_miou:
                        C.save_checkpoint(cfg.output_dir, self.state, it,
                                          extra={"miou": stats["metric"]},
                                          auto_remove=cfg.auto_remove,
                                          is_main=jax.process_index() == 0,
                                          backend=cfg.ckpt_backend)
                        if self.batch_stats:
                            C.save_aux_state(
                                cfg.output_dir, "batch_stats",
                                self.batch_stats, it, auto_remove=cfg.auto_remove,
                                is_main=jax.process_index() == 0)
                    max_miou = max(max_miou, stats["metric"])
                if it >= self.total_iters:
                    break
            epoch += 1
        self.logger.info(f"seg training done in {time.time() - t0:.0f}s; "
                         f"max mIoU {max_miou:.2f}")
        return {"max_miou": max_miou}
