"""mmcv.utils shim: Registry/build_from_cfg with mmcv's documented
semantics (type-keyed class lookup with parent-chain fallback,
default_args merged as setdefault)."""


def build_from_cfg(cfg, registry, default_args=None):
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise KeyError(f"cfg must be a dict with 'type', got {cfg!r}")
    args = dict(cfg)
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in "
                           f"{registry.name} registry")
    else:
        obj_cls = obj_type
    return obj_cls(**args)


class Registry:
    def __init__(self, name, build_func=None, parent=None, scope=None):
        self.name = name
        self._module_dict = {}
        self.parent = parent
        if build_func is not None:
            self.build_func = build_func
        elif parent is not None:
            self.build_func = parent.build_func
        else:
            self.build_func = build_from_cfg

    def get(self, key):
        node = self
        while node is not None:
            if key in node._module_dict:
                return node._module_dict[key]
            node = node.parent
        return None

    def register_module(self, name=None, force=False, module=None):
        def _register(cls):
            key = name if isinstance(name, str) else cls.__name__
            if not force and key in self._module_dict:
                raise KeyError(f"{key} already registered in {self.name}")
            self._module_dict[key] = cls
            return cls

        if module is not None:
            return _register(module)
        return _register

    def build(self, cfg, *args, **kwargs):
        return self.build_func(cfg, *args, registry=self, **kwargs) \
            if self.build_func is not build_from_cfg \
            else build_from_cfg(cfg, self, kwargs.get("default_args"))


def print_log(msg, logger=None, level=None):
    if logger == "silent":
        return
    print(msg)
