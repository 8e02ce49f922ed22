"""Test-only mmcv shim (mirror of tests/timm_shim's role).

mmcv is absent in this sandbox; the reference's live mmseg path
(dense_tasks/Segmentation/mmseg/...) imports a handful of mmcv symbols.
This shim provides faithful-minimal implementations of exactly those, so
the reference's OWN mmseg files (decode heads, losses, metrics) can be
executed unmodified as parity oracles.  Only public, documented mmcv
semantics are reproduced — no reference code is copied.

Version: mmseg/__init__.py asserts 1.3.13 <= mmcv < 1.5.0.
"""

__version__ = "1.4.8"


def load(path, *a, **k):  # losses/utils.py get_class_weight (str paths only)
    raise NotImplementedError("mmcv shim: file-backed class weights are "
                              "not used by any executed parity path")


def imread(*a, **k):  # core/evaluation/metrics.py str-label branch only
    raise NotImplementedError("mmcv shim: executed metrics parity passes "
                              "ndarrays, never label file paths")


from . import utils  # noqa: E402,F401
from . import cnn  # noqa: E402,F401
from . import runner  # noqa: E402,F401
from .utils import Registry, build_from_cfg, print_log  # noqa: E402,F401
