"""timm.data.transforms_factory shim (models/losses.py:3 imports
transforms_imagenet_train but never calls it)."""


def transforms_imagenet_train(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: transforms_imagenet_train is import-only in the "
        "reference's losses.py")
