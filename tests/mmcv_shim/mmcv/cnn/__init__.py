"""mmcv.cnn shim: ConvModule (conv-norm-act brick) with mmcv's documented
semantics for the configs the reference's seg heads use — BN/SyncBN norm
(identical numerics single-process), ReLU act, bias='auto' (off when a norm
follows), order ('conv','norm','act'), and the norm child registered under
the attribute name 'bn' (mmcv's infix for BN-family norms, which is what
mmseg checkpoints key on)."""

import torch.nn as nn

from ..utils import Registry

MODELS = Registry("model")

_NORMS = {
    "BN": nn.BatchNorm2d,
    "BN2d": nn.BatchNorm2d,
    "SyncBN": nn.BatchNorm2d,  # single-process numerics identical to BN
}


class ConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto",
                 conv_cfg=None, norm_cfg=None, act_cfg=dict(type="ReLU"),
                 inplace=True, with_spectral_norm=False,
                 padding_mode="zeros", order=("conv", "norm", "act")):
        super().__init__()
        assert conv_cfg is None, "shim: only plain Conv2d is needed"
        assert not with_spectral_norm and padding_mode == "zeros"
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.with_bias = bias
        self.order = tuple(order)
        assert set(self.order) == {"conv", "norm", "act"}

        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=bias)
        if self.with_norm:
            norm_type = norm_cfg["type"]
            if norm_type not in _NORMS:
                raise NotImplementedError(
                    f"mmcv shim: norm {norm_type} not needed by the "
                    f"reference seg configs (BN/SyncBN only)")
            norm = _NORMS[norm_type](out_channels)
            if norm_cfg.get("requires_grad", True) is False:
                for p in norm.parameters():
                    p.requires_grad = False
            self.norm_name = "bn"
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None
        if self.with_activation:
            if act_cfg["type"] != "ReLU":
                raise NotImplementedError(
                    f"mmcv shim: act {act_cfg['type']} not needed by the "
                    f"reference seg configs")
            self.activate = nn.ReLU(inplace=act_cfg.get("inplace", inplace))

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.norm_name else None

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = getattr(self, self.norm_name)(x)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x


from . import bricks  # noqa: E402,F401
