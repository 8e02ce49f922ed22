"""High-level training runner: wires config -> data -> model -> engine.

The reference spreads this across main_image.py:134-359 and
engine_finetune.py.  One runner serves all image entry points (full datasets
and VTAB); video and segmentation have their own thin variants.

TPU-native notes:
  * the device loop is: host loader yields uint8 canvases -> on-device
    augmentation -> jitted train step (student+teacher+loss+opt in one XLA
    program) — the only host<->device traffic is the raw uint8 batch;
  * eval gathers logits on device, computes metrics on host; FLOPs accounting
    uses the analytic table (reference reports it for video only,
    engine_finetune.py:341-352 — we report for both).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import RunConfig
from dynamic_tuning_tpu.data.datasets import build_image_dataset
from dynamic_tuning_tpu.data.loader import make_loader
from dynamic_tuning_tpu.data.transforms import augment_batch, normalize_batch
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.ops.flops import batch_select_flops, dense_vit_flops
from dynamic_tuning_tpu.parallel import mesh as M
from dynamic_tuning_tpu.train import checkpoint as C
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_eval_step, make_train_step,
                                             model_apply_fn)
from dynamic_tuning_tpu.train.optim import (count_params, make_optimizer,
                                            partition_params)
from dynamic_tuning_tpu.utils.logger import TensorBoardWriter, create_logger
from dynamic_tuning_tpu.utils.meters import MetricLogger
from dynamic_tuning_tpu.utils.metrics import mean_per_class_accuracy, topk_accuracy


def make_tb_flush(ml: MetricLogger, writer, steps_per_epoch: int,
                  lr_at=None):
    """Shared pipelined metric flush for the train loops.

    Materializes a completed step's scalars into the meters and, every 20
    steps on rank 0, writes loss (and lr when ``lr_at`` is given) on the
    reference's epoch_1000x TB axis (engine_finetune.py:95-101).  Both the
    image and video runners call this with step i-1's parts after step i
    is dispatched, keeping one step always in flight.
    """

    def flush(parts, step):
        ml.update(**{k: float(v) for k, v in parts.items()})
        if writer is not None and step % 20 == 0:
            e1000 = int((step / max(steps_per_epoch, 1)) * 1000)
            writer.add_scalar("loss", float(parts["loss"]), e1000)
            if lr_at is not None:
                writer.add_scalar("lr", float(lr_at(step)), e1000)

    return flush


class Runner:
    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        self.logger = create_logger(cfg.output_dir, jax.process_index())
        tb_dir = cfg.log_dir or cfg.output_dir
        self.writer = (TensorBoardWriter(tb_dir)
                       if tb_dir and jax.process_index() == 0
                       else None)
        self.mesh = M.make_mesh(cfg.mesh.model_parallel)
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # data -------------------------------------------------------------
        train_ds, val_ds, nb_classes, metric = build_image_dataset(
            cfg.data.dataset, cfg.data.data_path, no_aug=cfg.data.no_aug,
            canvas=cfg.data.canvas or 0)
        self.metric_name = metric
        self.nb_classes = nb_classes
        self.train_loader = make_loader(
            train_ds, cfg.data.batch_size, shuffle=True, drop_last=True,
            seed=cfg.seed, num_workers=cfg.data.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())
        self.val_loader = make_loader(
            val_ds, cfg.data.batch_size, shuffle=False,
            num_workers=cfg.data.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())

        # model ------------------------------------------------------------
        model_cfg = cfg.model if cfg.model.num_classes == nb_classes else \
            cfg.model.__class__(**{**cfg.model.__dict__, "num_classes": nb_classes})
        self.model = VisionTransformer(model_cfg, tuning=cfg.tuning,
                                       select=cfg.select, dtype=self.dtype)
        self.model_cfg = model_cfg
        self.apply_fn = model_apply_fn(self.model)

        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((2, model_cfg.img_size, model_cfg.img_size, 3))
        params = self.model.init(rng, sample)["params"]

        # pretrained import + freeze-by-missing (main_image.py:219-256) -----
        if cfg.finetune:
            sd = C.load_torch_state_dict(cfg.finetune) \
                if cfg.finetune.endswith((".pth", ".pt")) else C.load_params(cfg.finetune)
            if cfg.finetune.endswith((".pth", ".pt")):
                params, missing = C.import_pretrained(params, sd, self.logger)
            else:
                params = sd
            params = C.reinit_head(params, jax.random.fold_in(rng, 1))

        # --fulltune trains the whole backbone (main_image.py:254); default
        # is the reference freeze rule (adapters + router + head only)
        if cfg.fulltune:
            trainable, frozen = partition_params(params, lambda _: True)
        else:
            trainable, frozen = partition_params(params)
        self.logger.info(
            f"trainable params (M): {count_params(trainable) / 1e6:.2f}; "
            f"frozen (M): {count_params(frozen, exclude_head=False) / 1e6:.2f}")

        # optimizer ----------------------------------------------------------
        eff_batch = cfg.data.batch_size * cfg.accum_iter * jax.process_count()
        lr = cfg.optim.absolute_lr(eff_batch)
        self.logger.info(f"effective batch {eff_batch}; actual lr {lr:.2e}")
        self.steps_per_epoch = len(self.train_loader)
        from dynamic_tuning_tpu.train.optim import (warmup_cosine_schedule,
                                                    with_grad_accumulation)
        # MultiSteps advances the inner schedule once per applied step, so
        # the schedule sees steps_per_epoch / accum_iter steps per epoch
        applied_per_epoch = max(self.steps_per_epoch // max(cfg.accum_iter, 1), 1)
        # --start_epoch without --resume fast-forwards the schedule (the
        # reference drives lr from the absolute epoch, engine_finetune.py:39
        # with the loop starting at args.start_epoch); resume restores the
        # optimizer count instead (pass the same --start_epoch again if the
        # resumed run itself began mid-schedule)
        sched_offset = (cfg.start_epoch * applied_per_epoch
                        if cfg.start_epoch else 0)
        if cfg.resume and cfg.start_epoch:
            # the offset STACKS on the restored optimizer step count; that
            # is only right if the resumed run itself began mid-schedule
            # with the same --start_epoch (round-4 advisor finding)
            self.logger.warning(
                "--resume with --start_epoch: the LR schedule offset "
                f"({cfg.start_epoch} epochs) is applied ON TOP of the "
                "restored optimizer step count — only pass --start_epoch "
                "here if the resumed run itself was started with it")
        self.tx = with_grad_accumulation(make_optimizer(
            lr, min_lr=cfg.optim.min_lr, epochs=cfg.optim.epochs,
            warmup_epochs=cfg.optim.warmup_epochs,
            steps_per_epoch=applied_per_epoch,
            weight_decay=cfg.optim.weight_decay, betas=cfg.optim.betas,
            clip_grad=cfg.optim.clip_grad,
            start_step=sched_offset), cfg.accum_iter)
        # the same schedule, for TB lr scalars (reference
        # engine_finetune.py:95-101 logs loss AND lr); takes RAW step counts
        base_sched = warmup_cosine_schedule(
            lr, cfg.optim.min_lr, cfg.optim.epochs, cfg.optim.warmup_epochs,
            applied_per_epoch)
        self.lr_at = lambda step: base_sched(
            step // max(cfg.accum_iter, 1) + sched_offset)

        state = create_train_state(trainable, frozen, self.tx,
                                   jax.random.fold_in(rng, 2))
        self.state = M.shard_state(self.mesh, state)

        self.start_epoch = cfg.start_epoch
        self.max_metric = 0.0
        if cfg.resume:
            self.state, last_epoch, extra = C.load_checkpoint(cfg.resume,
                                                              self.state)
            self.state = M.shard_state(self.mesh, self.state)
            self.start_epoch = last_epoch + 1
            # checkpoints save only on improvement -> stored metric is the
            # best-so-far; without this the first post-resume eval always
            # "improves" over 0.0 and auto_remove prunes the true best
            self.max_metric = float(extra.get("metric", 0.0))
            self.logger.info(f"resumed from {cfg.resume} at epoch "
                             f"{self.start_epoch} "
                             f"(best metric {self.max_metric:.2f})")

        self.train_step = jax.jit(
            make_train_step(self.apply_fn, self.tx, cfg.select),
            donate_argnums=(0,))
        self.eval_step = jax.jit(make_eval_step(self.apply_fn,
                                                dispatch=cfg.eval_dispatch))
        self.aug_rng = jax.random.fold_in(rng, 3)

    # ------------------------------------------------------------------
    def _device_batch(self, imgs: np.ndarray, labels: np.ndarray,
                      train: bool) -> Tuple[jax.Array, jax.Array]:
        imgs = jnp.asarray(imgs)
        if self.cfg.data.no_aug:
            s = self.model_cfg.img_size
            if imgs.shape[1] != s:   # canvas != model resolution: resize
                # cubic = PIL-bicubic kernel, the reference's
                # interpolation=3 (image_datasets_noaug.py:16-23)
                imgs = jnp.clip(jax.image.resize(
                    imgs.astype(jnp.float32),
                    (imgs.shape[0], s, s, imgs.shape[-1]), "cubic"), 0, 255)
            xb = normalize_batch(imgs, self.cfg.data.inception_norm)
        else:
            if train:
                self.aug_rng, k = jax.random.split(self.aug_rng)
            else:
                k = jax.random.PRNGKey(0)
            xb = augment_batch(k, imgs, out_size=self.model_cfg.img_size,
                               inception=self.cfg.data.inception_norm,
                               train=train)
        return M.shard_batch(self.mesh, (xb, jnp.asarray(labels)))

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        ml = MetricLogger(logger=self.logger)
        header = f"Epoch: [{epoch}]"
        # Materialize step i-1's scalars only after step i is dispatched:
        # float() blocks until the device finishes, so flushing the PREVIOUS
        # step keeps one step always in flight (host aug/IO overlaps device
        # compute) instead of serializing host and device every iteration.
        # Logged meters run one step stale; the epoch averages are exact.
        step0 = int(self.state.step)  # one sync per epoch, not per step
        pending: Optional[Tuple[Dict, int]] = None
        i = 0
        flush = make_tb_flush(ml, self.writer, self.steps_per_epoch,
                              self.lr_at)

        for imgs, labels in ml.log_every(self.train_loader, 20, header):
            xb, yb = self._device_batch(imgs, labels, train=True)
            self.state, parts = self.train_step(self.state, xb, yb)
            if pending is not None:
                flush(*pending)
            i += 1
            pending = (parts, step0 + i)
        if pending is not None:
            flush(*pending)
        return {k: m.global_avg for k, m in ml.meters.items()}

    def load_eval_checkpoint(self, path: str):
        """Load weights for --eval_ckpt evaluation (no optimizer resume);
        re-lays the restored host-local arrays out on the mesh."""
        self.state, _, _ = C.load_checkpoint(path, self.state)
        self.state = M.shard_state(self.mesh, self.state)

    def evaluate(self) -> Dict[str, float]:
        all_logits, all_labels = [], []
        keep_sum, keep_n = 0.0, 0
        layer_keep = None
        gflops_sum, gflops_n = 0.0, 0
        for imgs, labels in self.val_loader:
            # multi-process tail batches: pad to a device multiple with
            # sentinel -1 labels, dropped after readback (mesh.pad_eval_batch)
            imgs, labels = M.pad_eval_batch(self.mesh, imgs, labels)
            xb, yb = self._device_batch(imgs, labels, train=False)
            logits, token_select = self.eval_step(
                self.state.trainable, self.state.frozen, xb)
            # host-local rows: np.asarray on a cross-process-sharded array
            # raises; each host keeps its own rows, allgathered below
            lb = M.host_local_rows(yb)
            valid = lb >= 0
            all_logits.append(M.host_local_rows(logits)[valid])
            all_labels.append(lb[valid])
            if token_select is not None:
                ts = M.host_local_rows(token_select).astype(np.float64)[valid]
                keep_sum += ts.sum()
                keep_n += ts.size
                per_layer = ts.mean(axis=(0, 2, 3))   # [L]
                layer_keep = (per_layer if layer_keep is None
                              else layer_keep + per_layer)
                g = batch_select_flops(
                    ts, T=self.model_cfg.seq_len, dim=self.model_cfg.embed_dim,
                    mlp_ratio=self.model_cfg.mlp_ratio,
                    bottleneck=self.cfg.tuning.ffn_num,
                    num_classes=self.nb_classes,
                    depth=self.model_cfg.depth)
                gflops_sum += g.sum()
                gflops_n += len(g)
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        if jax.process_count() > 1:  # cross-host eval concat
            from jax.experimental import multihost_utils
            logits = multihost_utils.process_allgather(logits)
            labels = multihost_utils.process_allgather(labels)
            logits = logits.reshape(-1, logits.shape[-1])
            labels = labels.reshape(-1)
        acc1, acc5 = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                                   (1, min(5, self.nb_classes)))
        stats = {"acc1": acc1, "acc5": acc5}
        stats["metric"] = (mean_per_class_accuracy(jnp.asarray(logits),
                                                   labels, self.nb_classes)
                           if self.metric_name == "mean_per_class_acc" else acc1)
        if keep_n:
            stats["keep_ratio"] = keep_sum / keep_n
            gf = gflops_sum / max(gflops_n, 1)
            dense = dense_vit_flops(self.model_cfg.seq_len,
                                    self.model_cfg.depth,
                                    self.model_cfg.embed_dim,
                                    self.model_cfg.mlp_ratio, self.nb_classes)
            stats["gflops"] = gf
            stats["flops_ratio_vs_dense"] = gf / dense
            self.logger.info(f"eval GFLOPs/sample {gf:.2f} "
                             f"({100 * gf / dense:.1f}% of dense)")
            if layer_keep is not None:  # per-layer keep rates
                rates = layer_keep / len(all_logits)
                self.logger.info("per-layer keep rates: "
                                 + " ".join(f"{r:.3f}" for r in rates))
        self.logger.info(f"eval: {json.dumps({k: round(float(v), 4) for k, v in stats.items()})}")
        return stats

    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        max_metric = self.max_metric
        t0 = time.time()
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            train_stats = self.train_one_epoch(epoch)
            self.logger.info(f"epoch {epoch} train: " + json.dumps(
                {k: round(v, 4) for k, v in train_stats.items()}))
            if (epoch + 1) % cfg.eval_freq == 0 or (epoch + 1) == cfg.optim.epochs:
                stats = self.evaluate()
                if cfg.output_dir and stats["metric"] >= max_metric:
                    C.save_checkpoint(cfg.output_dir, self.state, epoch,
                                      extra={"metric": stats["metric"]},
                                      auto_remove=cfg.auto_remove,
                                      is_main=jax.process_index() == 0,
                                      backend=cfg.ckpt_backend)
                max_metric = max(max_metric, stats["metric"])
                self.logger.info(f"Max metric: {max_metric:.2f}%")
        if cfg.output_dir and jax.process_index() == 0:
            from dynamic_tuning_tpu.train.optim import merge_params
            C.save_params(os.path.join(cfg.output_dir, "final_checkpoint.msgpack"),
                          merge_params(self.state.trainable, self.state.frozen))
        self.logger.info(f"Training time {time.time() - t0:.0f}s; "
                         f"max metric {max_metric:.2f}")
        return {"max_metric": max_metric}
