"""Configuration tree for the TPU-native Dynamic-Tuning framework.

One dataclass-based config tree replaces the reference's argparse-plus-EasyDict
split (reference: main_image.py:186-210 builds ``tuning_config`` and
``select_config`` EasyDicts inline).  Defaults mirror the reference recipes
(train_IN21K.sh / train_vtab.sh / train_video.sh) exactly so that runs are
comparable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


@dataclass(frozen=True)
class TuningConfig:
    """Adapter ("AdaptFormer"-style) settings.

    Mirrors the reference ``tuning_config`` EasyDict (main_image.py:186-195).
    """

    ffn_adapt: bool = True
    ffn_option: str = "parallel"            # parallel adapter on the MLP branch
    ffn_adapter_layernorm_option: str = "none"   # "none" | "in" | "out"
    ffn_adapter_init_option: str = "lora"   # "lora": kaiming-uniform down, zeros up
    ffn_adapter_scalar: str = "0.1"         # "0.1" | "1.0" | "learnable_scalar"
    ffn_num: int = 64                       # bottleneck width (64 img/video, 8-16 VTAB)
    d_model: int = 768
    dropout: float = 0.1                    # adapter dropout (Block builds Adapter(dropout=0.1))
    # MoE-enhanced adapter (paper-only feature; reference README.md:27).
    moe_experts: int = 0                    # 0 disables MoE; N>1 = N parallel experts
    moe_router_tau: float = 1.0


@dataclass(frozen=True)
class SelectConfig:
    """Token-dispatcher settings.

    Mirrors the reference ``select_config`` EasyDict (main_image.py:196-210).
    The vestigial layer-skip knobs are dropped (they are dead code in the
    reference: losses.py:87-115 is never called).
    """

    open: bool = True
    keep_layers: int = 0                    # blocks [0, keep_layers) have no router
    token_target_ratio: float = 0.5         # budget: mean keep-rate target
    token_loss_ratio: float = 2.0           # weight of the squared budget loss
    token_minimal: float = 0.0
    token_minimal_weight: float = 0.0
    tau: float = 5.0                        # gumbel-sigmoid temperature (dynamic_adapter.py:59)
    threshold: float = 0.5                  # hard gate threshold
    # TPU-native efficient-inference dispatch (replaces the reference's
    # dynamic-shape nonzero gather, model_speed_test.py:297-305):
    capacity_ratio: Optional[float] = None  # None -> use token_target_ratio


@dataclass(frozen=True)
class ModelConfig:
    """ViT backbone architecture (ViT-B/16 defaults)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0                  # head dropout
    pos_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    global_pool: str = "token"              # "token" | "avg"
    class_token: bool = True
    # perf knobs (TPU):
    gelu_approx: bool = False               # tanh GELU (VPU-cheap) vs exact erf
    residual_dtype: str = "float32"         # "bfloat16" halves residual HBM
                                            # traffic (inference-safe)
    remat: Union[bool, str] = False         # backward rematerialization:
                                            # False/"" off; True/"full" whole
                                            # blocks; "scores" recompute only
                                            # the [B,H,N,N] fp32 attention
                                            # score/prob tensors (the dominant
                                            # activation at big batches)
    quant: str = "none"                     # "int8" = W8A8 serving matmuls
                                            # (MXU double-rate; eval only)
    # video settings
    num_frames: int = 1                     # >1 enables the video path
    tubelet_size: int = 1

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size, self.img_size // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.class_token else 0)


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer + LR schedule; reference: train_IN21K.sh, util/lr_sched.py."""

    blr: float = 1e-3                       # base LR; lr = blr * eff_batch / 256
    lr: Optional[float] = None              # absolute LR overrides blr scaling
    min_lr: float = 0.0
    weight_decay: float = 0.01
    warmup_epochs: float = 20.0
    epochs: int = 100
    clip_grad: Optional[float] = None
    betas: Tuple[float, float] = (0.9, 0.999)

    def absolute_lr(self, eff_batch_size: int) -> float:
        if self.lr is not None:
            return self.lr
        return self.blr * eff_batch_size / 256.0


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "cifar100"
    data_path: str = ""
    batch_size: int = 128                   # per-device
    num_workers: int = 4
    inception_norm: bool = False            # IN21K jx checkpoints use inception mean/std
    no_aug: bool = False                    # VTAB-1K trains without augmentation
    # decode-canvas short side (None = 224 no-aug / 256 aug).  The reference
    # random-crops the ORIGINAL image; a larger canvas keeps more detail for
    # the on-device RandomResizedCrop at proportional loader cost.
    canvas: Optional[int] = None
    # video:
    num_frames: int = 8
    sampling_rate: int = 16
    test_num_segment: int = 3
    test_num_crop: int = 1
    randaug: Optional[str] = None           # e.g. "rand-m7-n4-mstd0.5-inc1"
    # train spatial resize — the reference RECIPES pick per dataset
    # (video_datasets.py: K400 'random_short_side_scale_jitter' with
    # scale_range [1.0, 1.15]; SSv2 'random_resized_crop' [0.08, 1.0])
    train_resize_type: str = "random_resized_crop"  # | "random_short_side_scale_jitter"
    jitter_min: Optional[int] = None        # short-side jitter bounds for the
    jitter_max: Optional[int] = None        # scale_jitter resize (None = 256/320)
    # horizontal flip in video train aug: True for K400, False for SSv2 —
    # direction-sensitive labels ("pushing left to right") must not mirror
    # (reference video_datasets.py:25 mirror=True / :56 mirror=False)
    mirror: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.  The reference is DP-only over NCCL
    (misc.py:243, main_image.py:281); we default to a 1-D data mesh but keep a
    model axis so TP shardings compile (ViT-B rarely needs it)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1                 # size of the model axis


@dataclass(frozen=True)
class RunConfig:
    """Top-level run configuration."""

    model: ModelConfig = field(default_factory=ModelConfig)
    tuning: TuningConfig = field(default_factory=TuningConfig)
    select: SelectConfig = field(default_factory=SelectConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 0
    output_dir: str = "./output_dir"
    eval_dispatch: bool = False     # evaluate via the capacity-dispatch path
    eval_freq: int = 1
    save_freq: int = 1
    resume: str = ""
    finetune: str = ""                      # path to pretrained .pth / .msgpack
    # train the whole backbone instead of adapters/router/head only
    # (reference --fulltune, main_image.py:254 / main_video.py:287)
    fulltune: bool = False
    accum_iter: int = 1
    # numerics: params fp32, matmul compute bf16 (the TPU analogue of the
    # reference's CUDA AMP autocast, engine_finetune.py:47)
    compute_dtype: str = "bfloat16"
    # "msgpack" (single-file, rank-0 writes) or "orbax" (async sharded,
    # every host writes its shards -- the multi-pod path)
    ckpt_backend: str = "msgpack"
    # prune superseded epoch checkpoints (reference --auto_remove,
    # misc.py:316; default ON here -- pass --no_auto_remove to keep all)
    auto_remove: bool = True
    # TensorBoard event dir (reference --log_dir); "" = output_dir
    log_dir: str = ""
    # first epoch when not resuming (reference --start_epoch; --resume
    # restores the epoch from the checkpoint and overrides this)
    start_epoch: int = 0

    def replace(self, **kw) -> "RunConfig":
        return dataclasses.replace(self, **kw)


def vtab_config(task: str, data_path: str = "") -> RunConfig:
    """The VTAB-1K recipe (reference: main_vtab.py:350-352, train_vtab.sh)."""
    return RunConfig(
        tuning=TuningConfig(ffn_num=16, ffn_adapter_scalar="1.0"),
        optim=OptimConfig(lr=1e-3, weight_decay=1e-4, warmup_epochs=10, epochs=100),
        data=DataConfig(dataset=task, data_path=data_path, batch_size=64, no_aug=True),
    )


def image_config(dataset: str = "cifar100", data_path: str = "") -> RunConfig:
    """The full-dataset image recipe (reference: train_IN21K.sh)."""
    return RunConfig(
        data=DataConfig(dataset=dataset, data_path=data_path, batch_size=128),
    )


def video_config(dataset: str = "k400", data_path: str = "") -> RunConfig:
    """The video recipe (reference: train_video.sh)."""
    epochs = 12 if dataset == "k400" else 50
    return RunConfig(
        model=ModelConfig(num_frames=8, num_classes=400 if dataset == "k400" else 174),
        optim=OptimConfig(blr=1e-3, warmup_epochs=2, epochs=epochs),
        data=DataConfig(dataset=dataset, data_path=data_path, batch_size=16,
                        num_frames=8, sampling_rate=16),
    )
