"""Test config: run everything on a virtual 8-device CPU platform so pjit /
mesh shardings are exercised without TPU hardware (the driver's
dryrun_multichip uses the same mechanism).

Note: this sandbox preloads jax via a sitecustomize hook with a TPU backend,
so setting JAX_PLATFORMS in os.environ here is too late — we must go through
jax.config.update (works as long as no backend has been initialized yet,
which holds at conftest-import time)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

from dynamic_tuning_tpu.config import (  # noqa: E402
    ModelConfig, SelectConfig, TuningConfig,
)


@pytest.fixture(scope="session")
def tiny_model_cfg():
    """A tiny ViT for fast tests (2 blocks, 32x32 imgs, 8x8 patches -> 17 tokens)."""
    return ModelConfig(img_size=32, patch_size=8, num_classes=10,
                       embed_dim=64, depth=2, num_heads=4)


@pytest.fixture(scope="session")
def tiny_tuning_cfg():
    return TuningConfig(ffn_num=8, d_model=64)


@pytest.fixture(scope="session")
def select_cfg():
    return SelectConfig()
