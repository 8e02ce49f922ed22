"""timm.layers shim: the layer classes/helpers the reference models use.

Semantics match timm's documented behavior for the configurations the
reference actually constructs (see each class docstring).  State-dict key
layout (``proj``, ``fc1``/``fc2``, …) is contract: the reference loads
timm-format checkpoints through these module names
(/root/reference/main_image.py:219-256).
"""

import collections.abc
import math
from itertools import repeat

import torch
import torch.nn as nn
import torch.nn.functional as F


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))
    return parse


to_2tuple = _ntuple(2)

_assert = torch._assert


def use_fused_attn(experimental: bool = False) -> bool:
    """The reference gates between SDPA and the manual softmax path on
    this flag (vision_transformer_IN21K.py:45,60-70); torch>=2 always has
    SDPA, and the two paths are numerically equivalent in fp32."""
    return hasattr(F, "scaled_dot_product_attention")


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    """timm's trunc_normal_ == torch.nn.init.trunc_normal_ (values drawn
    from N(mean, std) truncated to [a, b])."""
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


def lecun_normal_(tensor):
    """Variance-scaling (fan_in, truncated normal) init."""
    fan_in = nn.init._calculate_correct_fan(tensor, "fan_in")
    # constant from scipy.stats.truncnorm.std(a=-2, b=2, loc=0, scale=1)
    std = math.sqrt(1.0 / fan_in) / 0.87962566103423978
    return nn.init.trunc_normal_(tensor, std=std, a=-2.0, b=2.0)


def drop_path(x, drop_prob: float = 0.0, training: bool = False,
              scale_by_keep: bool = True):
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = x.new_empty(shape).bernoulli_(keep_prob)
    if keep_prob > 0.0 and scale_by_keep:
        random_tensor.div_(keep_prob)
    return x * random_tensor


class DropPath(nn.Module):
    """Stochastic depth per sample.  The reference constructs it only when
    drop_path > 0 (vision_transformer_IN21K.py:121,131)."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        return drop_path(x, self.drop_prob, self.training,
                         self.scale_by_keep)


class Mlp(nn.Module):
    """timm Mlp: fc1 -> act -> drop1 -> norm -> fc2 -> drop2.

    The reference constructs it with (in_features, hidden_features,
    act_layer, drop) only (vision_transformer_IN21K.py:124-129)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                 use_conv=False):
        super().__init__()
        assert not use_conv, "timm shim: conv Mlp not needed by reference"
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        bias = to_2tuple(bias)
        drop_probs = to_2tuple(drop)
        self.fc1 = nn.Linear(in_features, hidden_features, bias=bias[0])
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop_probs[0])
        self.norm = (norm_layer(hidden_features) if norm_layer is not None
                     else nn.Identity())
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias[1])
        self.drop2 = nn.Dropout(drop_probs[1])

    def forward(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop1(x)
        x = self.norm(x)
        x = self.fc2(x)
        x = self.drop2(x)
        return x


class PatchEmbed(nn.Module):
    """2D image -> patch-token embedding (Conv2d proj + flatten to BNC).

    The reference constructs it with (img_size, patch_size, in_chans,
    embed_dim, bias) (vision_transformer_IN21K.py:272-279) and relies on
    ``num_patches`` and the ``proj.{weight,bias}`` state-dict keys."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 embed_dim=768, norm_layer=None, flatten=True,
                 output_fmt=None, bias=True, strict_img_size=True,
                 dynamic_img_pad=False):
        super().__init__()
        self.img_size = to_2tuple(img_size)
        self.patch_size = to_2tuple(patch_size)
        self.grid_size = (self.img_size[0] // self.patch_size[0],
                          self.img_size[1] // self.patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten and output_fmt is None
        self.strict_img_size = strict_img_size
        self.proj = nn.Conv2d(in_chans, embed_dim,
                              kernel_size=self.patch_size,
                              stride=self.patch_size, bias=bias)
        self.norm = (norm_layer(embed_dim) if norm_layer is not None
                     else nn.Identity())

    def forward(self, x):
        B, C, H, W = x.shape
        if self.strict_img_size:
            _assert(H == self.img_size[0],
                    f"Input height ({H}) != model ({self.img_size[0]}).")
            _assert(W == self.img_size[1],
                    f"Input width ({W}) != model ({self.img_size[1]}).")
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)  # BCHW -> BNC
        x = self.norm(x)
        return x


class PatchDropout(nn.Module):
    """Random token dropout keeping prefix tokens.  Imported by the
    reference but only constructed when patch_drop_rate > 0
    (vision_transformer_IN21K.py:285-291) — never on the executed
    recipes; implemented for completeness."""

    def __init__(self, prob: float = 0.5, num_prefix_tokens: int = 1,
                 ordered: bool = False, return_indices: bool = False):
        super().__init__()
        assert 0 <= prob < 1.0
        self.prob = prob
        self.num_prefix_tokens = num_prefix_tokens
        self.ordered = ordered
        self.return_indices = return_indices

    def forward(self, x):
        if not self.training or self.prob == 0.0:
            return (x, None) if self.return_indices else x
        if self.num_prefix_tokens:
            prefix, x = (x[:, :self.num_prefix_tokens],
                         x[:, self.num_prefix_tokens:])
        else:
            prefix = None
        B, L = x.shape[:2]
        num_keep = max(1, int(L * (1.0 - self.prob)))
        keep = torch.argsort(torch.randn(B, L, device=x.device),
                             dim=-1)[:, :num_keep]
        if self.ordered:
            keep = keep.sort(dim=-1)[0]
        x = x.gather(1, keep.unsqueeze(-1).expand((-1, -1) + x.shape[2:]))
        if prefix is not None:
            x = torch.cat((prefix, x), dim=1)
        return (x, keep) if self.return_indices else x
