"""timm.models.helpers shim.  The reference imports these symbols
(vision_transformer_IN21K.py:13) but its executed entry points
(vit_base_patch16_224_in21k -> VisionTransformer(...) direct construction)
never call them; each stub fails loudly if a future path reaches it."""


def named_apply(fn, module, name="", depth_first=True, include_root=False):
    if not depth_first and include_root:
        fn(module=module, name=name)
    for child_name, child_module in module.named_children():
        child_name = f"{name}.{child_name}" if name else child_name
        named_apply(fn=fn, module=child_module, name=child_name,
                    depth_first=depth_first, include_root=True)
    if depth_first and include_root:
        fn(module=module, name=name)
    return module


def checkpoint_seq(functions, x, every=1, flatten=False,
                   skip_last=False, preserve_rng_state=True):
    raise NotImplementedError(
        "timm shim: checkpoint_seq is not exercised by the reference's "
        "executed paths (grad_checkpointing is never enabled)")


def build_model_with_cfg(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: build_model_with_cfg is import-only in the reference")


def resolve_pretrained_cfg(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: resolve_pretrained_cfg is import-only in the reference")


def adapt_input_conv(*args, **kwargs):
    raise NotImplementedError(
        "timm shim: adapt_input_conv is import-only in the reference")
