"""dynamic_tuning_tpu: a TPU-native JAX framework with the capabilities of
NUS-HPC-AI-Lab/Dynamic-Tuning (DyT, NeurIPS 2024, arXiv 2403.11808).

Built from scratch for TPU: flax models with static-shape token dispatch,
Pallas fused kernels, pjit/mesh data parallelism, on-device augmentation.
"""

__version__ = "0.1.0"

from dynamic_tuning_tpu.config import (  # noqa: F401
    DataConfig, MeshConfig, ModelConfig, OptimConfig, RunConfig, SelectConfig,
    TuningConfig, image_config, video_config, vtab_config,
)

__all__ = [
    "DataConfig", "MeshConfig", "ModelConfig", "OptimConfig", "RunConfig",
    "SelectConfig", "TuningConfig", "image_config", "video_config",
    "vtab_config",
]


def __getattr__(name):
    """Lazy top-level access to the heavyweight entry objects (keeps
    ``import dynamic_tuning_tpu`` light)."""
    lazy = {
        "VisionTransformer": ("dynamic_tuning_tpu.models.vit",
                              "VisionTransformer"),
        "vit_base_patch16_224_in21k": ("dynamic_tuning_tpu.models.vit",
                                       "vit_base_patch16_224_in21k"),
        "VideoVisionTransformer": ("dynamic_tuning_tpu.models.video_vit",
                                   "VideoVisionTransformer"),
        "DyTSegmentor": ("dynamic_tuning_tpu.models.upernet", "DyTSegmentor"),
        "fast_vit_forward": ("dynamic_tuning_tpu.models.fast_inference",
                             "fast_vit_forward"),
        "Runner": ("dynamic_tuning_tpu.train.runner", "Runner"),
        "VideoRunner": ("dynamic_tuning_tpu.train.video_runner", "VideoRunner"),
        "SegRunner": ("dynamic_tuning_tpu.train.seg_runner", "SegRunner"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
