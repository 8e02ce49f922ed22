"""Load the reference's OWN torch model files as the parity oracle.

Everything numerical on the torch side of the reference-executed parity
tests runs through code imported unmodified from ``/root/reference``:
``models/vision_transformer_IN21K.py`` (model), ``models/dynamic_adapter.py``
(Adapter/TokenSelect/gumbel), ``models/losses.py`` (AdaLoss),
``util/lr_sched.py`` (per-iteration schedule), and
``video_models/video_vision_transformer_IN21K.py`` (video model).
``engine_finetune.py`` itself (train_one_epoch / evaluate / evaluate_video,
with ``misc.py`` and ``util/metrics.py``) is ALSO executed, via
:func:`load_reference_engine` — its sole CUDA hard-call,
``torch.cuda.synchronize()`` (engine_finetune.py:84), is no-opped by the
tests at run time.  :class:`ReferenceTrainer` (a line-for-line composition
of engine_finetune.py:45-77) remains for per-STEP trajectory tests, which
the epoch-granularity engine API doesn't expose.  The data side executes
``video_datasets/rand_augment.py`` and ``util/crop.py`` the same way
(:func:`load_reference_rand_augment`, :func:`load_reference_crop`).

Import prerequisites handled here:
  * ``timm`` is absent in the sandbox -> ``tests/timm_shim`` (faithful
    minimal shim) is prepended to ``sys.path``.
  * numpy>=2 removed ``numpy.lib.arraysetops`` (losses.py:1 imports a
    stale symbol from it) -> a one-symbol module is registered in
    ``sys.modules``.
  * the reference uses repo-root-relative packages (``models.*``) ->
    ``/root/reference`` is appended to ``sys.path`` (after our repo, so
    nothing shadows dynamic_tuning_tpu).
"""

from __future__ import annotations

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch
import torch.nn.functional as tF

REFERENCE_ROOT = os.environ.get("DYT_REFERENCE_ROOT", "/root/reference")
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "timm_shim")


def reference_available() -> bool:
    return os.path.isfile(os.path.join(
        REFERENCE_ROOT, "models", "vision_transformer_IN21K.py"))


def _install_import_environment():
    if "numpy.lib.arraysetops" not in sys.modules:
        m = types.ModuleType("numpy.lib.arraysetops")
        m.isin = np.isin
        sys.modules["numpy.lib.arraysetops"] = m
    if _SHIM not in sys.path:
        sys.path.insert(0, _SHIM)
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)


_CACHE = {}


def _install_engine_import_environment():
    """Stubs for the import-time deps of ``engine_finetune.py`` that cannot
    exist in this sandbox.  All three are environment shims, not reference
    edits:

    * ``torch._six`` — removed in torch>=1.13; ``misc.py:20`` takes only
      ``inf`` from it.
    * ``fvcore`` — ``block_flops_dict.py:2-3`` imports FlopCountAnalysis,
      used only by the never-called ``get_base_flops``; the engine imports
      just ``batch_select_flops`` (pure torch).
    * ``easydict`` — ``block_flops_dict.py:8``; a faithful ~10-line
      attr-access dict (the engine path never constructs one, but keep the
      semantics real in case a helper does).
    """
    import math

    if "torch._six" not in sys.modules:
        m = types.ModuleType("torch._six")
        m.inf = math.inf
        sys.modules["torch._six"] = m
    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fvnn = types.ModuleType("fvcore.nn")

        class _FlopCountAnalysis:  # only get_base_flops (dead here) uses it
            def __init__(self, *a, **k):
                raise NotImplementedError("fvcore stub: FlopCountAnalysis")

        fvnn.FlopCountAnalysis = _FlopCountAnalysis
        fv.nn = fvnn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fvnn
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None, **kw):
                super().__init__()
                for k, v in dict(d or {}, **kw).items():
                    self[k] = v

            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError:
                    raise AttributeError(name)

            def __setattr__(self, name, value):
                self[name] = value

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed


def load_reference_engine():
    """Import (once) the reference's OWN train/eval engine, unmodified:
    ``engine_finetune.py`` (train_one_epoch / evaluate / evaluate_video)
    plus the ``misc.py`` it drives (MetricLogger, NativeScaler).

    Runtime CPU-executability (verified against the files): the only CUDA
    hard-call on the train path is ``torch.cuda.synchronize()``
    (engine_finetune.py:84) — tests no-op it via monkeypatch;
    ``torch.cuda.amp.autocast``/``GradScaler`` self-disable on a CPU-only
    build (fp32 compute, identity scaling), and every other ``.cuda()``
    sits behind ``is_dist_avail_and_initialized()`` / world-size>1 guards.
    """
    if "engine" not in _CACHE:
        _install_import_environment()
        _install_engine_import_environment()
        import importlib

        _CACHE["misc"] = importlib.import_module("misc")
        _CACHE["engine"] = importlib.import_module("engine_finetune")
        for key in ("misc", "engine"):
            assert _CACHE[key].__file__.startswith(REFERENCE_ROOT), (
                key, _CACHE[key].__file__)
    return {k: _CACHE[k] for k in ("misc", "engine")}


def load_reference_rand_augment():
    """Import (once) the reference's OWN RandAugment implementation,
    ``video_datasets/rand_augment.py``, unmodified — pure stdlib + PIL +
    numpy, so it executes as-is.  ``video_datasets`` has no __init__.py, so
    the module is loaded by file path."""
    if "rand_augment" not in _CACHE:
        import importlib.util

        path = os.path.join(REFERENCE_ROOT, "video_datasets",
                            "rand_augment.py")
        spec = importlib.util.spec_from_file_location(
            "reference_rand_augment", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHE["rand_augment"] = mod
    return _CACHE["rand_augment"]


def load_reference_crop():
    """Import (once) the reference's ``util/crop.py`` (the BYOL single-draw
    RandomResizedCrop that image_datasets.py:17 imports), unmodified.

    torchvision is absent in this sandbox; crop.py only SUBCLASSES
    ``transforms.RandomResizedCrop`` and overrides ``get_params`` (a
    staticmethod using just math/PIL/torch), so a two-class shim module
    satisfies the import without touching any executed line."""
    if "crop" not in _CACHE:
        _install_import_environment()
        _install_torchvision_shim()
        import importlib

        _CACHE["crop"] = importlib.import_module("util.crop")
        assert _CACHE["crop"].__file__.startswith(REFERENCE_ROOT)
    return _CACHE["crop"]


def _install_torchvision_shim():
    """torchvision is absent in this sandbox; the executed reference files
    only need the module to EXIST (crop.py subclasses
    transforms.RandomResizedCrop; datasets/vtab.py imports transforms and
    never touches it on the executed paths).  The one symbol an EXECUTED
    path does call is ``transforms.Compose`` (transform.py:658 wraps the
    rand-augment callable in one), so Compose carries torchvision's real
    apply-in-order semantics."""
    if "torchvision" not in sys.modules:
        import importlib.machinery

        def _shim(name, is_pkg=False):
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(
                name, loader=None, is_package=is_pkg)
            if is_pkg:
                mod.__path__ = []
            sys.modules[name] = mod
            return mod

        tv = _shim("torchvision", is_pkg=True)
        tv.__dyt_shim__ = True
        tvt = _shim("torchvision.transforms", is_pkg=True)
        tvf = _shim("torchvision.transforms.functional")

        class RandomResizedCrop:  # bare base for crop.py:16's subclass
            pass

        tvt.RandomResizedCrop = RandomResizedCrop
        tvt.functional = tvf
        tv.transforms = tvt
    if getattr(sys.modules["torchvision"], "__dyt_shim__", False):
        tvt = sys.modules["torchvision.transforms"]
        if not hasattr(tvt, "Compose"):

            class Compose:  # torchvision semantics: apply in list order
                def __init__(self, transforms):
                    self.transforms = list(transforms)

                def __call__(self, x):
                    for t in self.transforms:
                        x = t(x)
                    return x

            class _DecodeOnly:  # k400.py __getitem__ only (never executed)
                def __init__(self, *a, **k):
                    raise RuntimeError("torchvision shim: decode-path only")

            tvt.Compose = Compose
            tvt.ToTensor = _DecodeOnly
            tvt.ToPILImage = _DecodeOnly


def _install_video_decode_stubs():
    """``decord`` / ``av`` are absent in this sandbox; the executed video
    dataset files import them at module level but only touch them inside
    ``__getitem__``'s decode step, which no executed test path reaches.
    The stubs fail loudly if anything ever does."""
    import importlib.machinery

    for name in ("decord", "av"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(
                name, loader=None)

            def _fail(*a, _n=name, **k):
                raise RuntimeError(f"{_n} stub: decode paths are not "
                                   f"executable in this sandbox")

            mod.VideoReader = _fail
            mod.open = _fail
            sys.modules[name] = mod


_MMCV_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "mmcv_shim")


def load_reference_mmseg():
    """Import (once) the LIVE files of the reference's vendored mmseg fork
    unmodified: the decode heads its seg recipe builds (UPerHead + PPM,
    FCNHead, BaseDecodeHead), their loss stack (CrossEntropyLoss +
    weight_reduce_loss + accuracy), the resize wrapper, and the evaluation
    metrics (intersect_and_union / eval_metrics) — i.e. everything
    our ~700-LoC native seg reimplementation replaces on the live path
    (models/upernet.py, utils/metrics.py).

    mmcv is absent -> ``tests/mmcv_shim`` provides the handful of symbols
    these files import (ConvModule, Registry, BaseModule, fp16 decorators),
    see its module docstring.  The mmseg package __init__s pull in dozens
    of dead-for-us backbones/heads with much wider mmcv surface, so the
    needed REAL files are loaded as submodules of a synthetic ``mmseg``
    package skeleton — every executed line still comes from
    ``/root/reference``, asserted below."""
    if "mmseg_uper" in _CACHE:
        return _mmseg_dict()

    if _MMCV_SHIM not in sys.path:
        sys.path.insert(0, _MMCV_SHIM)
    import importlib.machinery
    import importlib.util

    seg_root = os.path.join(REFERENCE_ROOT, "dense_tasks", "Segmentation",
                            "mmseg")

    def _pkg(name):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        spec = importlib.machinery.ModuleSpec(name, loader=None,
                                              is_package=True)
        spec.submodule_search_locations = []
        mod.__spec__ = spec
        mod.__path__ = []
        sys.modules[name] = mod
        return mod

    def _real(dotted, relpath):
        path = os.path.join(seg_root, relpath)
        spec = importlib.util.spec_from_file_location(dotted, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[dotted] = mod
        spec.loader.exec_module(mod)
        assert mod.__file__.startswith(REFERENCE_ROOT), dotted
        return mod

    mmseg = _pkg("mmseg")
    ops_pkg = _pkg("mmseg.ops")
    core_pkg = _pkg("mmseg.core")
    models_pkg = _pkg("mmseg.models")
    losses_pkg = _pkg("mmseg.models.losses")
    heads_pkg = _pkg("mmseg.models.decode_heads")

    wrappers = _real("mmseg.ops.wrappers", "ops/wrappers.py")
    ops_pkg.resize = wrappers.resize
    ops_pkg.Upsample = wrappers.Upsample

    def _no_sampler(cfg, context=None):
        raise NotImplementedError(
            "mmseg skeleton: no executed config sets a pixel sampler")

    core_pkg.build_pixel_sampler = _no_sampler

    builder = _real("mmseg.models.builder", "models/builder.py")
    models_pkg.builder = builder

    loss_utils = _real("mmseg.models.losses.utils",
                       "models/losses/utils.py")
    accuracy_mod = _real("mmseg.models.losses.accuracy",
                         "models/losses/accuracy.py")
    ce_mod = _real("mmseg.models.losses.cross_entropy_loss",
                   "models/losses/cross_entropy_loss.py")
    losses_pkg.accuracy = accuracy_mod.accuracy
    losses_pkg.CrossEntropyLoss = ce_mod.CrossEntropyLoss
    losses_pkg.utils = loss_utils

    _real("mmseg.models.decode_heads.decode_head",
          "models/decode_heads/decode_head.py")
    psp = _real("mmseg.models.decode_heads.psp_head",
                "models/decode_heads/psp_head.py")
    fcn = _real("mmseg.models.decode_heads.fcn_head",
                "models/decode_heads/fcn_head.py")
    uper = _real("mmseg.models.decode_heads.uper_head",
                 "models/decode_heads/uper_head.py")
    metrics = _real("mmseg.core.evaluation.metrics",
                    "core/evaluation/metrics.py")

    mmseg.ops = ops_pkg
    mmseg.core = core_pkg
    mmseg.models = models_pkg

    # the segmentor layer: base.py (_parse_losses, the 'sum every *loss*
    # key' rule our seg_loss composition cites) and encoder_decoder.py
    # (forward_train token-loss wiring, slide_inference window protocol)
    core_utils_misc = _real("mmseg.core.utils.misc", "core/utils/misc.py")
    core_pkg.add_prefix = core_utils_misc.add_prefix
    _pkg("mmseg.models.segmentors")
    base = _real("mmseg.models.segmentors.base", "models/segmentors/base.py")
    enc_dec = _real("mmseg.models.segmentors.encoder_decoder",
                    "models/segmentors/encoder_decoder.py")

    _CACHE["mmseg_uper"] = uper
    _CACHE["mmseg_psp"] = psp
    _CACHE["mmseg_fcn"] = fcn
    _CACHE["mmseg_ce"] = ce_mod
    _CACHE["mmseg_metrics"] = metrics
    _CACHE["mmseg_builder"] = builder
    _CACHE["mmseg_wrappers"] = wrappers
    _CACHE["mmseg_base"] = base
    _CACHE["mmseg_encdec"] = enc_dec
    return _mmseg_dict()


def _mmseg_dict():
    return {"uper": _CACHE["mmseg_uper"], "psp": _CACHE["mmseg_psp"],
            "fcn": _CACHE["mmseg_fcn"], "ce": _CACHE["mmseg_ce"],
            "metrics": _CACHE["mmseg_metrics"],
            "builder": _CACHE["mmseg_builder"],
            "wrappers": _CACHE["mmseg_wrappers"],
            "base": _CACHE["mmseg_base"],
            "encdec": _CACHE["mmseg_encdec"]}


def load_reference_video_datasets():
    """Import (once) the reference's OWN video dataset files unmodified:
    ``video_datasets/{transform,k400,sthv2_dataset}.py``.

    ``video_datasets`` has no ``__init__.py`` but its files use relative
    imports (``.transform``, ``.random_erasing``, ``.load_binary``), so a
    synthetic package ``reference_video_datasets`` is registered whose
    ``__path__`` points at the reference directory — every submodule then
    resolves to reference files, asserted below.  Import-time deps that
    cannot exist here are stubbed (:func:`_install_video_decode_stubs`,
    torchvision shim); pandas is real."""
    if "k400" not in _CACHE:
        _install_import_environment()
        _install_torchvision_shim()
        _install_video_decode_stubs()
        import importlib
        import importlib.machinery

        pkgname = "reference_video_datasets"
        if pkgname not in sys.modules:
            pkg = types.ModuleType(pkgname)
            path = [os.path.join(REFERENCE_ROOT, "video_datasets")]
            spec = importlib.machinery.ModuleSpec(
                pkgname, loader=None, is_package=True)
            spec.submodule_search_locations = path
            pkg.__spec__ = spec
            pkg.__path__ = path
            sys.modules[pkgname] = pkg
        _CACHE["video_transform"] = importlib.import_module(
            pkgname + ".transform")
        _CACHE["k400"] = importlib.import_module(pkgname + ".k400")
        _CACHE["sthv2"] = importlib.import_module(
            pkgname + ".sthv2_dataset")
        for key in ("video_transform", "k400", "sthv2"):
            assert _CACHE[key].__file__.startswith(REFERENCE_ROOT), (
                key, _CACHE[key].__file__)
    return {"transform": _CACHE["video_transform"],
            "k400": _CACHE["k400"], "sthv2": _CACHE["sthv2"]}


def load_reference_optim_utils():
    """Import (once) the reference's optimizer utilities unmodified:
    ``util/lars.py`` (MoCo-v3 LARS — pure torch), ``util/lr_decay.py``
    (BEiT layer-wise lr decay — stdlib json only) and ``util/metrics.py``
    (pure torch).  All three are 'dead utils' in the live recipes but part
    of the component inventory (SURVEY §2d)."""
    if "lars" not in _CACHE:
        _install_import_environment()
        import importlib

        _CACHE["lars"] = importlib.import_module("util.lars")
        _CACHE["lr_decay"] = importlib.import_module("util.lr_decay")
        _CACHE["metrics"] = importlib.import_module("util.metrics")
        for key in ("lars", "lr_decay", "metrics"):
            assert _CACHE[key].__file__.startswith(REFERENCE_ROOT), (
                key, _CACHE[key].__file__)
    return {k: _CACHE[k] for k in ("lars", "lr_decay", "metrics")}


def load_reference_vtab():
    """Import (once) the reference's ``datasets/vtab.py`` unmodified: the
    19-task registry (:8-30), get_classes_num, default_flist_reader, and
    the ImageFilelist dataset."""
    if "vtab" not in _CACHE:
        _install_import_environment()
        _install_torchvision_shim()
        import importlib.util

        # by file path: the package name "datasets" is shadowed by an
        # installed library, and vtab.py itself has no relative imports
        path = os.path.join(REFERENCE_ROOT, "datasets", "vtab.py")
        spec = importlib.util.spec_from_file_location(
            "reference_vtab", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHE["vtab"] = mod
    return _CACHE["vtab"]


def load_reference_modules():
    """Import (once) and return the reference modules we execute."""
    if "vit" not in _CACHE:  # keyed guard: load_reference_engine also fills
        # _CACHE, so `if not _CACHE` would wrongly skip these imports
        _install_import_environment()
        import importlib

        _CACHE["vit"] = importlib.import_module(
            "models.vision_transformer_IN21K")
        _CACHE["adapter"] = importlib.import_module("models.dynamic_adapter")
        _CACHE["losses"] = importlib.import_module("models.losses")
        _CACHE["lr_sched"] = importlib.import_module("util.lr_sched")
        _CACHE["video_vit"] = importlib.import_module(
            "video_models.video_vision_transformer_IN21K")
        # imports must resolve to the reference tree, not a stray install
        for key in ("vit", "adapter", "losses", "lr_sched", "video_vit"):
            assert _CACHE[key].__file__.startswith(REFERENCE_ROOT), (
                key, _CACHE[key].__file__)
    return dict(_CACHE)


def _install_seg_import_environment():
    """Fakes for the three mm* modules the seg backbone file imports.

    The reference's live seg backbone
    (dense_tasks/Segmentation/backbone/segmentation_vision_transformer_IN21K.py)
    imports only timm symbols (covered by tests/timm_shim), the reference's
    own models.dynamic_adapter, and three mm* touchpoints that are pure
    infrastructure: a checkpoint loader (never called here), a logger
    getter, and the BACKBONES registry decorator.  Pre-seeding sys.modules
    keeps the import away from the VENDORED mmseg/mmcv_custom packages in
    the same tree (which require the absent mmcv at import time)."""
    if "mmcv_custom" in sys.modules:
        return
    mmcv_custom = types.ModuleType("mmcv_custom")
    mmcv_custom.load_checkpoint = lambda *a, **k: None
    sys.modules["mmcv_custom"] = mmcv_custom

    import logging

    mmseg = types.ModuleType("mmseg")
    mmseg_utils = types.ModuleType("mmseg.utils")
    mmseg_utils.get_root_logger = lambda *a, **k: logging.getLogger("mmseg")
    mmseg_models = types.ModuleType("mmseg.models")
    mmseg_builder = types.ModuleType("mmseg.models.builder")

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmseg_builder.BACKBONES = _Registry()
    mmseg.utils = mmseg_utils
    mmseg.models = mmseg_models
    mmseg_models.builder = mmseg_builder
    sys.modules["mmseg"] = mmseg
    sys.modules["mmseg.utils"] = mmseg_utils
    sys.modules["mmseg.models"] = mmseg_models
    sys.modules["mmseg.models.builder"] = mmseg_builder


def load_reference_seg_module():
    """Import (once) the reference's live seg backbone file unmodified.

    The backbone dir has no __init__.py, so the file is loaded by path
    under a private module name; its ``models.dynamic_adapter`` import
    resolves to the reference tree already on sys.path."""
    if "seg_vit" not in _CACHE:
        _install_import_environment()
        _install_seg_import_environment()
        import importlib.util

        path = os.path.join(
            REFERENCE_ROOT, "dense_tasks", "Segmentation", "backbone",
            "segmentation_vision_transformer_IN21K.py")
        spec = importlib.util.spec_from_file_location(
            "_reference_seg_backbone", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_reference_seg_backbone"] = mod
        spec.loader.exec_module(mod)
        assert mod.__file__.startswith(REFERENCE_ROOT)
        _CACHE["seg_vit"] = mod
    return _CACHE["seg_vit"]


def build_reference_seg_model(*, img=512, patch=16, dim=768, depth=12,
                              heads=12, ffn=64, out_indices=(3, 5, 7, 11),
                              use_rel_pos_bias=True,
                              token_target_ratio=0.5):
    """Construct the reference seg backbone (VisionTransformer21K) exactly
    as the mmseg config does (configs/.../our_vit.py: windowed rel-pos
    bias, 4 FPN taps, in-backbone AdaLoss)."""
    mod = load_reference_seg_module()
    return mod.VisionTransformer21K(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, num_classes=0, drop_path_rate=0.0,
        tuning_config=make_tuning_config(ffn, dim),
        select_config=make_select_config(token_target_ratio),
        out_indices=list(out_indices), use_rel_pos_bias=use_rel_pos_bias)


def make_tuning_config(ffn_num: int, d_model: int):
    """The exact tuning_config main_image.py:186-195 builds (EasyDict ->
    attribute access; SimpleNamespace is interface-equivalent)."""
    return SimpleNamespace(
        ffn_adapt=True,
        ffn_option="parallel",
        ffn_adapter_layernorm_option="none",
        ffn_adapter_init_option="lora",
        ffn_adapter_scalar="0.1",
        ffn_num=ffn_num,
        d_model=d_model,
        attn_bn=ffn_num,
    )


def make_select_config(token_target_ratio: float = 0.5):
    """main_image.py:196-210."""
    return SimpleNamespace(
        open=True, keep_layers=0,
        layer_target_ratio=0.5, layer_loss_ratio=2.0,
        layer_diverse_ratio=0.0, layer_entropy_weight=0.0,
        layer_minimal_weight=0.0, layer_minimal=0.0,
        token_ratio=2.0, token_target_ratio=token_target_ratio,
        token_minimal=0.0, token_minimal_weight=0.0,
    )


def build_reference_image_model(*, img=224, patch=16, dim=768, depth=12,
                                heads=12, classes=1000, ffn=64):
    """Construct the reference image model (the factory path for the real
    ViT-B shape, direct VisionTransformer construction otherwise — same
    class, main_image.py:212-215 / vision_transformer_IN21K.py:418-424)."""
    ref = load_reference_modules()["vit"]
    tc = make_tuning_config(ffn, dim)
    sc = make_select_config()
    if (img, patch, dim, depth, heads) == (224, 16, 768, 12, 12):
        model = ref.vit_base_patch16_224_in21k(
            num_classes=classes, drop_path_rate=0.0,
            tuning_config=tc, select_config=sc)
    else:
        model = ref.VisionTransformer(
            img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
            num_heads=heads, num_classes=classes, drop_path_rate=0.0,
            tuning_config=tc, select_config=sc)
    return model


def build_reference_video_model(*, img=224, patch=16, dim=768, depth=12,
                                heads=12, classes=400, ffn=64):
    """Construct the reference video model
    (video_vision_transformer_IN21K.py:279-415)."""
    ref = load_reference_modules()["video_vit"]
    model = ref.VisionTransformer(
        img_size=img, patch_size=patch, embed_dim=dim, depth=depth,
        num_heads=heads, num_classes=classes, drop_path_rate=0.0,
        tuning_config=make_tuning_config(ffn, dim),
        select_config=make_select_config())
    return model


def zero_adapter_dropout(model):
    """The reference Block hardcodes Adapter dropout=0.1
    (vision_transformer_IN21K.py:133); the cross-framework train-parity
    contract is noise-free, so pin the runtime rate attribute (a plain
    float consumed by nn.functional.dropout, dynamic_adapter.py:127) to 0.
    No reference code is altered — this is run-time configuration."""
    for m in model.modules():
        if hasattr(m, "adapter_layernorm_option") and hasattr(m, "dropout"):
            m.dropout = 0.0
    return model


def zero_gumbel_noise(monkeypatch):
    """Pin the reference's gumbel gate noise to zero for deterministic
    train parity: _gumbel_sigmoid (dynamic_adapter.py:25-55) draws
    g1-g2 = -log(E1)+log(E2) with E~Exp(1); filling the exponential draws
    with 1.0 makes both logs 0 so the logistic noise vanishes while the
    straight-through structure is untouched.  The JAX side pins
    jax.random.logistic to zeros — the same contract."""
    monkeypatch.setattr(
        torch.Tensor, "exponential_",
        lambda self, lambd=1.0, *, generator=None: self.fill_(1.0))


def flax_to_image_sd(flat: dict, *, depth: int) -> dict:
    """Map a flat flax param tree ({path-tuple: ndarray}) to the reference
    image model's state-dict layout (torch [out,in] kernels, OIHW conv) so
    both frameworks start from bit-identical weights."""
    t = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
         for k, v in flat.items()}

    sd = {
        "cls_token": t[("cls_token",)],
        "pos_embed": t[("pos_embed",)],
        "patch_embed.proj.weight":
            t[("patch_embed", "proj", "kernel")].permute(3, 2, 0, 1),
        "patch_embed.proj.bias": t[("patch_embed", "proj", "bias")],
        "norm.weight": t[("norm", "scale")],
        "norm.bias": t[("norm", "bias")],
        "head.weight": t[("head", "kernel")].T,
        "head.bias": t[("head", "bias")],
    }
    for i in range(depth):
        f = (f"blocks_{i}",)
        p = f"blocks.{i}."

        def lin(name, *path):
            sd[p + name + ".weight"] = t[f + path + ("kernel",)].T
            sd[p + name + ".bias"] = t[f + path + ("bias",)]

        def lnorm(name, *path):
            sd[p + name + ".weight"] = t[f + path + ("scale",)]
            sd[p + name + ".bias"] = t[f + path + ("bias",)]

        lnorm("norm1", "norm1")
        lnorm("norm2", "norm2")
        lin("attn.qkv", "attn", "qkv")
        lin("attn.proj", "attn", "proj")
        lin("mlp.fc1", "mlp", "fc1")
        lin("mlp.fc2", "mlp", "fc2")
        lin("adaptmlp.down_proj", "adaptmlp", "down_proj")
        lin("adaptmlp.up_proj", "adaptmlp", "up_proj")
        lin("mlp_token_select.mlp_head", "mlp_token_select", "mlp_head")
    return {k: v.contiguous() for k, v in sd.items()}


def flax_to_video_sd(flat: dict, *, depth: int) -> dict:
    """Image mapping + the video model's attentive-pool extras
    (video_vision_transformer_IN21K.py:27-110,408-413)."""
    sd = flax_to_image_sd(flat, depth=depth)
    t = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
         for k, v in flat.items()}
    ab = ("attentive_blocks",)
    ca = ab + ("cross_attn",)
    sd["query_token"] = t[("query_token",)]
    for name in ("norm_q", "norm_k", "norm_v"):
        sd[f"attentive_blocks.{name}.weight"] = t[ab + (name, "scale")]
        sd[f"attentive_blocks.{name}.bias"] = t[ab + (name, "bias")]
    for name in ("q", "k", "v"):
        sd[f"attentive_blocks.cross_attn.{name}.weight"] = \
            t[ca + (name, "kernel")].T
    sd["attentive_blocks.cross_attn.q_bias"] = t[ca + ("q_bias",)]
    sd["attentive_blocks.cross_attn.v_bias"] = t[ca + ("v_bias",)]
    sd["attentive_blocks.cross_attn.proj.weight"] = \
        t[ca + ("proj", "kernel")].T
    sd["attentive_blocks.cross_attn.proj.bias"] = t[ca + ("proj", "bias")]
    return {k: v.contiguous() for k, v in sd.items()}


def flax_to_seg_sd(flat: dict, *, depth: int) -> dict:
    """Map a flat flax seg-backbone tree to VisionTransformer21K's
    state-dict layout: image-style blocks + per-block rel-pos bias table +
    FPN deconvs.  ConvTranspose: torch weight = flax kernel
    permute(2,3,0,1) then a spatial flip (flax conv_transpose does not
    flip the kernel; torch's transposed conv does — layout pinned
    empirically to 0.0 on random tensors)."""
    t = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
         for k, v in flat.items()}
    sd = {
        "cls_token": t[("cls_token",)],
        "pos_embed": t[("pos_embed",)],
        "patch_embed.proj.weight":
            t[("patch_embed", "proj", "kernel")].permute(3, 2, 0, 1),
        "patch_embed.proj.bias": t[("patch_embed", "proj", "bias")],
    }

    def deconv(torch_name, flax_name):
        sd[torch_name + ".weight"] = (
            t[(flax_name, "kernel")].permute(2, 3, 0, 1).flip(2, 3))
        sd[torch_name + ".bias"] = t[(flax_name, "bias")]

    deconv("fpn1.0", "fpn1_deconv1")
    deconv("fpn1.2", "fpn1_deconv2")
    deconv("fpn2.0", "fpn2_deconv")

    for i in range(depth):
        f = (f"blocks_{i}",)
        p = f"blocks.{i}."

        def lin(name, *path):
            sd[p + name + ".weight"] = t[f + path + ("kernel",)].T
            sd[p + name + ".bias"] = t[f + path + ("bias",)]

        def lnorm(name, *path):
            sd[p + name + ".weight"] = t[f + path + ("scale",)]
            sd[p + name + ".bias"] = t[f + path + ("bias",)]

        lnorm("norm1", "norm1")
        lnorm("norm2", "norm2")
        lin("attn.qkv", "attn", "qkv")
        lin("attn.proj", "attn", "proj")
        lin("mlp.fc1", "mlp", "fc1")
        lin("mlp.fc2", "mlp", "fc2")
        lin("adaptmlp.down_proj", "adaptmlp", "down_proj")
        lin("adaptmlp.up_proj", "adaptmlp", "up_proj")
        lin("mlp_token_select.mlp_head", "mlp_token_select", "mlp_head")
        sd[p + "attn.relative_position_bias_table"] = \
            t[f + ("attn", "relative_position_bias_table")]
    return {k: v.contiguous() for k, v in sd.items()}


class ReferenceTrainer:
    """Drive the REFERENCE model + REFERENCE AdaLoss + REFERENCE lr
    schedule through the training step of engine_finetune.py:45-77.

    Executed reference code per step: two model forwards (student +
    complete_model teacher) through models/vision_transformer_IN21K.py,
    gates through models/dynamic_adapter.py, AdaLoss through
    models/losses.py, LR through util/lr_sched.adjust_learning_rate.
    This class only composes them exactly as the engine does:

        cls_kl_loss = F.kl_div(log_softmax(out), log_softmax(teacher.detach()),
                               reduction='batchmean', log_target=True)
        teacher_loss = criterion.base_criterion(teacher_outputs, targets)
        loss, loss_dict = criterion(dict(prediction=out, **token_select), y)
        loss = loss + teacher_loss + cls_kl_loss

    plus the freeze rule of main_image.py:249-256 (missing-from-checkpoint
    params + head train; rest frozen) and its AdamW construction (:285).
    """

    def __init__(self, model, *, lr_args, token_target_ratio=0.5,
                 token_ratio=2.0, weight_decay=0.01):
        mods = load_reference_modules()
        self.model = model
        self.lr_sched = mods["lr_sched"]
        self.lr_args = lr_args
        self.criterion = mods["losses"].AdaLoss(
            base_criterion=torch.nn.CrossEntropyLoss(),
            token_target_ratio=token_target_ratio,
            token_loss_ratio=token_ratio,
            token_minimal=0.0, token_minimal_weight=0.0)
        # freeze rule: adapters + routers (missing keys at load) + head
        for name, p in model.named_parameters():
            p.requires_grad = ("adaptmlp" in name
                               or "mlp_token_select" in name
                               or name.startswith("head."))
        self.opt = torch.optim.AdamW(
            [p for _, p in model.named_parameters() if p.requires_grad],
            lr=lr_args.lr, weight_decay=weight_decay)

    def step(self, x: np.ndarray, y: np.ndarray, epoch_frac: float) -> dict:
        """x is NHWC fp32 (converted to the reference's NCHW here)."""
        self.model.train(True)
        self.lr_sched.adjust_learning_rate(self.opt, epoch_frac,
                                           self.lr_args)
        samples = torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()
        targets = torch.from_numpy(y)

        outputs, token_select = self.model(samples)
        teacher_outputs, _ = self.model(samples, complete_model=True)
        cls_kl_loss = tF.kl_div(
            tF.log_softmax(outputs, dim=-1),
            tF.log_softmax(teacher_outputs.detach(), dim=-1),
            reduction="batchmean", log_target=True)
        teacher_loss = self.criterion.base_criterion(teacher_outputs,
                                                     targets)
        loss, loss_dict = self.criterion(
            dict(prediction=outputs, **token_select), targets)
        loss = loss + teacher_loss + cls_kl_loss

        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        return dict(
            loss=loss.item(),
            base_loss=loss_dict["base_loss"].item(),
            token_loss=loss_dict["token_loss"].item(),
            teacher_loss=teacher_loss.item(),
            distillation_loss=cls_kl_loss.item(),
            keep_ratio=token_select["token_select"].detach().mean().item(),
        )
