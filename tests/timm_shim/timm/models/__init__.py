"""timm.models shim namespace."""


def create_model(*args, **kwargs):
    """Imported by /root/reference/block_flops_dict.py:7 but never called
    on any executed path (the reference constructs its models directly via
    the vit_base_* factories); loud stub."""
    raise NotImplementedError(
        "timm shim: create_model is not exercised by the reference's "
        "executed paths")
