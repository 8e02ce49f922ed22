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
