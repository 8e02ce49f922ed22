"""timm.layers.format shim (imported by the reference model files at
vision_transformer_IN21K.py:6 but unused on its executed paths)."""

from enum import Enum

import torch


class Format(str, Enum):
    NCHW = "NCHW"
    NHWC = "NHWC"
    NCL = "NCL"
    NLC = "NLC"


def nchw_to(x: torch.Tensor, fmt: Format):
    if fmt == Format.NHWC:
        return x.permute(0, 2, 3, 1)
    if fmt == Format.NLC:
        return x.flatten(2).transpose(1, 2)
    if fmt == Format.NCL:
        return x.flatten(2)
    return x
