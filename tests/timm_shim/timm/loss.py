"""timm.loss shim (models/losses.py:2 does ``from timm import loss`` and
never uses the module)."""
