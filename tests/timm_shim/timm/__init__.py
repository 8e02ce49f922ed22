"""Test-only minimal ``timm`` shim.

Provides exactly the symbols the reference's model files import
(``/root/reference/models/vision_transformer_IN21K.py:6-22``,
``dynamic_adapter.py:6-22``, ``losses.py:2-3``,
``video_models/video_vision_transformer_IN21K.py:6-23``) so the
reference's OWN torch code can be imported and executed unmodified as the
parity oracle (VERDICT r3 "Next round" #1).

The layers the reference exercises at runtime — ``PatchEmbed``, ``Mlp``,
``DropPath``, ``trunc_normal_``, ``use_fused_attn`` — are faithful
re-statements of the (well-known, BSD-licensed) timm semantics, written
from their documented behavior; registry/model-builder helpers that the
reference imports but never calls on its executed paths are inert stubs
that fail loudly if reached.

This package lives under ``tests/`` only and is inserted on ``sys.path``
by ``tests/reference_oracle.py``; it is NOT part of dynamic_tuning_tpu.
"""

from . import loss  # noqa: F401  (``from timm import loss`` in losses.py)
