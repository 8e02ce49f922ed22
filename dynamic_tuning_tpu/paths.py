"""Machine-local dataset/checkpoint path registry.

The reference switches path sets with a ``CLUSTER`` env var over two dicts
(configs.py:4-34).  Same contract here: set ``DYT_CLUSTER`` (default
"default") and register your machines' paths below, or override at runtime
with ``register_cluster``.
"""

from __future__ import annotations

import os
from typing import Dict

_REGISTRY: Dict[str, Dict[str, Dict[str, str]]] = {
    "default": {
        "datasets": {
            # e.g. "cifar100": "/data", "k400": "/data/k400",
        },
        "checkpoints": {
            # e.g. "VIT_BASE_IN21K": "/ckpts/vit_base_patch16_224_in21k.pth",
        },
    },
}


def register_cluster(name: str, datasets: Dict[str, str],
                     checkpoints: Dict[str, str]):
    _REGISTRY[name] = {"datasets": dict(datasets),
                       "checkpoints": dict(checkpoints)}


def _cluster() -> str:
    return os.environ.get("DYT_CLUSTER", "default")


def dataset_path(name: str, fallback: str = "") -> str:
    return _REGISTRY.get(_cluster(), {}).get("datasets", {}).get(name, fallback)


def checkpoint_path(name: str, fallback: str = "") -> str:
    return _REGISTRY.get(_cluster(), {}).get("checkpoints", {}).get(name, fallback)
