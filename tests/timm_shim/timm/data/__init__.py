"""timm.data shim: normalization constants (real values — the reference
uses them for transforms) plus a loud Mixup stub (imported by
engine_finetune.py:9, constructed only when mixup is enabled, which the
DyT recipes never do)."""

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


class Mixup:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "timm shim: Mixup is not exercised by the reference's "
            "executed recipes (mixup=0)")
