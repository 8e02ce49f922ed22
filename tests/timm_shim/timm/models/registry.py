"""timm.models.registry shim: the reference imports ``register_model``
(vision_transformer_IN21K.py:16) but never decorates anything with it in
the files under test; identity passthrough keeps any future use inert."""


def register_model(fn=None, *args, **kwargs):
    if fn is None:
        return lambda f: f
    return fn
