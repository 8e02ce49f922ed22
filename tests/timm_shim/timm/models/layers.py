"""timm.models.layers shim — legacy alias of timm.layers (the reference
imports DropPath/trunc_normal_/lecun_normal_/_assert/to_2tuple from here,
vision_transformer_IN21K.py:14-15)."""

from ..layers import (  # noqa: F401
    DropPath,
    Mlp,
    PatchDropout,
    PatchEmbed,
    _assert,
    drop_path,
    lecun_normal_,
    to_2tuple,
    trunc_normal_,
    use_fused_attn,
)
