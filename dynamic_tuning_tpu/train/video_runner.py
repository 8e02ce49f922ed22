"""Video training runner (reference main_video.py + engine_finetune.py
train_video_one_epoch :109-203 / evaluate_video :282-356).

Differences from the image Runner: clip-shaped batches with on-device clip
augmentation, multi-view eval with view-averaged logits, and the per-frame
FLOPs accounting that the reference reports actively for video
(engine_finetune.py:341-352)."""

from __future__ import annotations

import json
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import RunConfig
from dynamic_tuning_tpu.data.loader import DataLoader
from dynamic_tuning_tpu.data.video import build_video_dataset
from dynamic_tuning_tpu.data.video_transforms import augment_clip_batch
from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer
from dynamic_tuning_tpu.ops.flops import batch_select_flops, dense_vit_flops
from dynamic_tuning_tpu.parallel import mesh as M
from dynamic_tuning_tpu.train import checkpoint as C
from dynamic_tuning_tpu.train.engine import (create_train_state,
                                             make_eval_step, make_train_step,
                                             model_apply_fn)
from dynamic_tuning_tpu.train.optim import (count_params, make_optimizer,
                                            partition_params)
from dynamic_tuning_tpu.utils.logger import create_logger
from dynamic_tuning_tpu.utils.meters import MetricLogger
from dynamic_tuning_tpu.utils.metrics import topk_accuracy


class VideoRunner:
    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        self.logger = create_logger(cfg.output_dir, jax.process_index())
        # rank-0 TB scalars, like the reference video loop
        # (engine_finetune.py:191-197 writes loss/lr on the epoch_1000x axis
        # through the same log_writer as the image loop)
        from dynamic_tuning_tpu.utils.logger import TensorBoardWriter
        tb_dir = cfg.log_dir or cfg.output_dir
        self.writer = (TensorBoardWriter(tb_dir)
                       if tb_dir and jax.process_index() == 0 else None)
        self.mesh = M.make_mesh(cfg.mesh.model_parallel)
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        train_ds, val_ds, nb_classes = build_video_dataset(
            cfg.data.dataset, cfg.data.data_path,
            clip_len=cfg.data.num_frames, sampling_rate=cfg.data.sampling_rate,
            test_num_segment=cfg.data.test_num_segment,
            test_num_crop=cfg.data.test_num_crop,
            spatial_size=cfg.model.img_size)
        self.nb_classes = nb_classes
        self.train_loader = DataLoader(
            train_ds, cfg.data.batch_size, shuffle=True, drop_last=True,
            seed=cfg.seed, num_workers=cfg.data.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())
        self.val_loader = DataLoader(
            val_ds, max(cfg.data.batch_size // 2, 1), shuffle=False,
            num_workers=cfg.data.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count())

        mc = cfg.model
        model_cfg = mc if mc.num_classes == nb_classes else \
            mc.__class__(**{**mc.__dict__, "num_classes": nb_classes})
        self.model_cfg = model_cfg
        self.model = VideoVisionTransformer(model_cfg, tuning=cfg.tuning,
                                            select=cfg.select, dtype=self.dtype)
        self.apply_fn = model_apply_fn(self.model)

        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((1, cfg.data.num_frames, model_cfg.img_size,
                            model_cfg.img_size, 3))
        params = self.model.init(rng, sample)["params"]

        if cfg.finetune:
            if cfg.finetune.endswith((".pth", ".pt")):
                sd = C.load_torch_state_dict(cfg.finetune)
                params, _ = C.import_pretrained(params, sd, self.logger)
            else:
                params = C.load_params(cfg.finetune)
            params = C.reinit_head(params, jax.random.fold_in(rng, 1))

        # --fulltune trains the whole backbone (main_video.py:287)
        pred = (lambda _: True) if cfg.fulltune else self._trainable_pred
        trainable, frozen = partition_params(params, pred)
        self.logger.info(
            f"trainable params (M): {count_params(trainable) / 1e6:.2f}")

        eff_batch = cfg.data.batch_size * cfg.accum_iter * jax.process_count()
        lr = cfg.optim.absolute_lr(eff_batch)
        self.steps_per_epoch = len(self.train_loader)
        from dynamic_tuning_tpu.train.optim import (warmup_cosine_schedule,
                                                    with_grad_accumulation)
        # accumulate like the image Runner: the LR above is scaled by
        # accum_iter, so the optimizer must step once per accum_iter
        # micro-batches (MultiSteps), and its schedule advances per applied
        # step
        applied_per_epoch = max(
            self.steps_per_epoch // max(cfg.accum_iter, 1), 1)
        sched_offset = (cfg.start_epoch * applied_per_epoch
                        if cfg.start_epoch else 0)  # see Runner
        self.tx = with_grad_accumulation(make_optimizer(
            lr, min_lr=cfg.optim.min_lr, epochs=cfg.optim.epochs,
            warmup_epochs=cfg.optim.warmup_epochs,
            steps_per_epoch=applied_per_epoch,
            weight_decay=cfg.optim.weight_decay,
            clip_grad=cfg.optim.clip_grad,
            start_step=sched_offset), cfg.accum_iter)
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
            self.state, last, extra = C.load_checkpoint(cfg.resume, self.state)
            # restored arrays are host-local: re-lay them out on the mesh
            self.state = M.shard_state(self.mesh, self.state)
            self.start_epoch = last + 1
            # checkpoints save only on improvement, so the stored metric IS
            # the best-so-far: restoring it stops the first post-resume eval
            # from "improving" over 0.0 and pruning the true best
            self.max_metric = float(extra.get("metric", 0.0))

        self.train_step = jax.jit(
            make_train_step(self.apply_fn, self.tx, cfg.select),
            donate_argnums=(0,))
        self.eval_step = jax.jit(make_eval_step(self.apply_fn,
                                                dispatch=cfg.eval_dispatch))
        self.aug_rng = jax.random.fold_in(rng, 3)

    @staticmethod
    def _trainable_pred(path):
        # video additions train too: query token + attentive pooling head
        from dynamic_tuning_tpu.train.optim import default_trainable_predicate
        return (default_trainable_predicate(path) or path[0] == "query_token"
                or path[0] == "attentive_blocks")

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        ml = MetricLogger(logger=self.logger)
        step0 = int(self.state.step)  # one sync per epoch
        i = 0
        pending = None
        from dynamic_tuning_tpu.train.runner import make_tb_flush
        flush = make_tb_flush(ml, self.writer, self.steps_per_epoch,
                              self.lr_at)

        for clips, labels in ml.log_every(self.train_loader, 20,
                                          f"Epoch: [{epoch}]"):
            self.aug_rng, k = jax.random.split(self.aug_rng)
            xb = augment_clip_batch(k, jnp.asarray(clips),
                                    crop=self.model_cfg.img_size,
                                    inception=self.cfg.data.inception_norm,
                                    train=True,
                                    flip=self.cfg.data.mirror,
                                    randaug=self.cfg.data.randaug,
                                    resize_type=self.cfg.data.train_resize_type,
                                    min_size=self.cfg.data.jitter_min or 256,
                                    max_size=self.cfg.data.jitter_max or 320)
            xb, yb = M.shard_batch(self.mesh, (xb, jnp.asarray(labels)))
            self.state, parts = self.train_step(self.state, xb, yb)
            # flush the PREVIOUS step's scalars so one step stays in flight
            # (see Runner.train_one_epoch); meters run one step stale
            if pending is not None:
                flush(*pending)
            i += 1
            pending = (parts, step0 + i)
        if pending is not None:
            flush(*pending)
        return {k2: m.global_avg for k2, m in ml.meters.items()}

    def load_eval_checkpoint(self, path: str):
        """Load weights for --eval_ckpt evaluation (no optimizer resume);
        re-lays the restored host-local arrays out on the mesh."""
        self.state, _, _ = C.load_checkpoint(path, self.state)
        self.state = M.shard_state(self.mesh, self.state)

    def evaluate(self, save_views_dir: str | None = None) -> Dict[str, float]:
        """Multi-view eval; optionally persists per-view outputs for offline
        merging across processes (reference final_test/merge,
        engine_finetune.py:360-534 -> utils/multiview.py)."""
        all_logits, all_labels = [], []
        gflops, keeps = [], []
        # gate rows per clip: the tubelet stem folds tubelet_size frames
        # into one frame GROUP, so token_select has num_frames/tubelet rows
        # per clip, not num_frames
        T = (self.cfg.data.num_frames
             // max(self.model_cfg.tubelet_size, 1))
        clip_offset = 0
        for clips, labels in self.val_loader:
            # multi-process tail batches: pad whole clips (V rows each) to a
            # device multiple, sentinel -1 labels dropped after readback
            clips, labels = M.pad_eval_batch(self.mesh, clips, labels,
                                             rows_per_item=clips.shape[1])
            B, V = clips.shape[0], clips.shape[1]
            flat = jnp.asarray(clips).reshape(B * V, *clips.shape[2:])
            xb = augment_clip_batch(jax.random.PRNGKey(0), flat,
                                    crop=self.model_cfg.img_size,
                                    inception=self.cfg.data.inception_norm,
                                    train=False,
                                    pre_cropped=flat.shape[2]
                                    == self.model_cfg.img_size)
            # mesh placement + host-local readback (multi-host: the state is
            # mesh-sharded, so the batch must be globally assembled, and
            # np.asarray on the sharded output would raise)
            (xb,) = M.shard_batch(self.mesh, (xb,))
            logits, token_select = self.eval_step(
                self.state.trainable, self.state.frozen, xb)
            valid = labels >= 0
            labels = labels[valid]
            per_view = M.host_local_rows(logits).reshape(B, V, -1)[valid]
            nB = len(labels)
            if save_views_dir:
                from dynamic_tuning_tpu.utils.multiview import save_view_outputs
                # GLOBAL clip ids: the val loader strided-shards clips
                # (rank r gets global clips r, r+pc, ...), and
                # merge_view_outputs groups by raw id across all rank files
                # — local ids would alias different clips across ranks
                local_pos = np.arange(clip_offset, clip_offset + nB)
                gids = local_pos * jax.process_count() + jax.process_index()
                save_view_outputs(save_views_dir, jax.process_index(),
                                  np.repeat(gids, V),
                                  per_view.reshape(nB * V, -1),
                                  np.repeat(labels, V),
                                  # truncate this rank's shard on the first
                                  # batch: don't merge a previous eval's
                                  # logits from the same dir
                                  append=clip_offset > 0)
            clip_offset += nB
            logits = per_view.mean(axis=1)
            all_logits.append(logits)
            all_labels.append(labels)
            if token_select is not None:
                ts = M.host_local_rows(token_select)  # [(B*V*T), L, N-1, 1]
                ts = ts.reshape(B, -1, *ts.shape[1:])[valid]
                ts = ts.reshape(-1, *ts.shape[2:])
                keeps.append(ts.mean())
                g = batch_select_flops(
                    ts, T=self.model_cfg.seq_len,
                    dim=self.model_cfg.embed_dim,
                    mlp_ratio=self.model_cfg.mlp_ratio,
                    bottleneck=self.cfg.tuning.ffn_num,
                    num_classes=self.nb_classes, depth=self.model_cfg.depth)
                # per-clip = sum over its T frames
                gflops.append(g.reshape(-1, T).sum(-1).mean())
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        if jax.process_count() > 1:  # cross-host eval concat (as image path)
            from jax.experimental import multihost_utils
            logits = multihost_utils.process_allgather(logits)
            labels = multihost_utils.process_allgather(labels)
            logits = logits.reshape(-1, logits.shape[-1])
            labels = labels.reshape(-1)
        acc1, acc5 = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                                   (1, min(5, self.nb_classes)))
        stats = {"acc1": acc1, "acc5": acc5, "metric": acc1}
        if gflops:
            dense = dense_vit_flops(self.model_cfg.seq_len,
                                    self.model_cfg.depth,
                                    self.model_cfg.embed_dim,
                                    self.model_cfg.mlp_ratio,
                                    num_classes=self.nb_classes) * T
            stats["gflops_per_clip"] = float(np.mean(gflops))
            stats["flops_ratio_vs_dense"] = stats["gflops_per_clip"] / dense
            stats["keep_ratio"] = float(np.mean(keeps))
        self.logger.info("eval: " + json.dumps(
            {k: round(float(v), 4) for k, v in stats.items()}))
        return stats

    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        max_metric, t0 = self.max_metric, time.time()
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            stats = self.train_one_epoch(epoch)
            self.logger.info(f"epoch {epoch} train: " + json.dumps(
                {k: round(v, 4) for k, v in stats.items()}))
            if (epoch + 1) % cfg.eval_freq == 0 or (epoch + 1) == cfg.optim.epochs:
                ev = self.evaluate()
                if cfg.output_dir and ev["metric"] >= max_metric:
                    C.save_checkpoint(cfg.output_dir, self.state, epoch,
                                      extra={"metric": ev["metric"]},
                                      auto_remove=cfg.auto_remove,
                                      is_main=jax.process_index() == 0,
                                      backend=cfg.ckpt_backend)
                max_metric = max(max_metric, ev["metric"])
        self.logger.info(f"video training done in {time.time() - t0:.0f}s; "
                         f"max metric {max_metric:.2f}")
        return {"max_metric": max_metric}
