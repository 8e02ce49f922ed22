"""mmcv.runner shim: BaseModule (init_cfg-carrying nn.Module) and the
fp16 decorators.  With fp16 disabled (mmseg sets fp16_enabled=False and
the reference config has fp16=None), mmcv's auto_fp16/force_fp32 are
identity wrappers — exactly what the shim provides."""

import torch.nn as nn


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self._is_init = False
        self.init_cfg = init_cfg

    @property
    def is_init(self):
        return self._is_init

    def init_weights(self):
        # parity tests inject parameters explicitly; mmcv's cfg-driven
        # initializers are never the quantity under test
        self._is_init = True
        for m in self.children():
            if hasattr(m, "init_weights"):
                m.init_weights()


class ModuleList(nn.ModuleList, BaseModule):
    def __init__(self, modules=None, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.ModuleList.__init__(self, modules)


def auto_fp16(apply_to=None, out_fp32=False):
    def decorator(fn):
        return fn

    return decorator


def force_fp32(apply_to=None, out_fp16=False):
    def decorator(fn):
        return fn

    return decorator
