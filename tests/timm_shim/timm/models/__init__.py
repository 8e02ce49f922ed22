"""timm.models shim namespace."""
