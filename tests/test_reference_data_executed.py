"""Data-pipeline parity against the reference's OWN executed code.

The transform tests elsewhere pin our JAX augmentation ops against PIL
called directly from the test — a transcription of WHICH PIL call the
reference makes.  These tests execute the reference's own files instead:

  * ``video_datasets/rand_augment.py`` (pure PIL/numpy, imported unmodified
    by file path): level->magnitude maps for every op, the config-string
    parser (`rand_augment_transform`) including its selected transform
    list, per-op prob/magnitude/mstd, the bool("0") 'inc0' quirk, and the
    magnitude_std clip rule — plus the hand-written ``solarize_add`` LUT.
  * ``util/crop.py`` (the BYOL single-draw RandomResizedCrop that
    ``datasets/image_datasets.py:17`` imports): ``get_params`` executed with
    both frameworks fed identical underlying uniform draws.
  * ``util/pos_embed.py``: the sincos generator and the image pos-embed
    grid resize executed vs ours; the reference's VIDEO variant is executed
    to document that it is dead code that crashes on real input.
  * ``video_datasets/random_erasing.py``: the 10-try box sampler executed
    (first strictly-fitting draw wins, inclusive corner) vs our
    lax.fori_loop port, identical draws, including the reject-redraw path.
  * ``datasets/vtab.py``: the 19-task registry, class counts, file-list
    reader, and ImageFilelist dataset executed vs our registry/parser.

Randomness is pinned by patching the DRAW primitives (random.random /
random.gauss / torch uniform_/randint / jax.random.uniform+bernoulli) — no
reference line is altered.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.data import randaugment as RA
from dynamic_tuning_tpu.data.transforms import _sample_crop_box

from reference_oracle import (load_reference_crop,
                              load_reference_rand_augment,
                              reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

IMG_SIZE = 32

# our op name -> the reference transform name per severity family
# (rand_augment.py:391-421; our TranslateX/Y are the Rel variants the
# reference's _RAND_*_TRANSFORMS lists actually select)
_REF_NAME = {
    True: {  # increasing family (_RAND_INCREASING_TRANSFORMS)
        "Posterize": "PosterizeIncreasing", "Solarize": "SolarizeIncreasing",
        "Color": "ColorIncreasing", "Contrast": "ContrastIncreasing",
        "Brightness": "BrightnessIncreasing",
        "Sharpness": "SharpnessIncreasing",
        "TranslateX": "TranslateXRel", "TranslateY": "TranslateYRel",
    },
    False: {"TranslateX": "TranslateXRel", "TranslateY": "TranslateYRel"},
}


def _ref_name(our_name, increasing):
    return _REF_NAME[increasing].get(our_name, our_name)


def test_level_to_arg_executed_all_ops(monkeypatch):
    """Every (op, magnitude, sign) cell of our _magnitude table vs the
    reference's executed LEVEL_TO_ARG functions (rand_augment.py:206-312).
    Signs are driven through both branches by pinning the draw primitives:
    reference negates when random.random() > 0.5 (:203); ours keeps the
    positive branch when jax.random.bernoulli is True."""
    ra = load_reference_rand_augment()
    hparams = dict(ra._HPARAMS_DEFAULT)

    for increasing in (True, False):
        for our_name, _fn in RA.OPS:
            ref = _ref_name(our_name, increasing)
            level_fn = ra.LEVEL_TO_ARG[ref]
            if level_fn is None:  # AutoContrast / Equalize / Invert
                continue
            for mag in range(0, 11):
                for negate in (False, True):
                    monkeypatch.setattr(
                        ra.random, "random",
                        lambda neg=negate: 1.0 if neg else 0.0)
                    monkeypatch.setattr(
                        jax.random, "bernoulli",
                        lambda key, p=0.5, shape=None, neg=negate:
                        jnp.asarray(not neg))
                    (want,) = level_fn(float(mag), hparams)
                    got = float(RA._magnitude(our_name, jnp.float32(mag),
                                              jax.random.PRNGKey(0),
                                              IMG_SIZE,
                                              increasing=increasing))
                    if our_name in ("TranslateX", "TranslateY"):
                        want = want * IMG_SIZE  # ref op scales pct by size
                    assert got == pytest.approx(want, abs=2e-5), (
                        our_name, ref, increasing, mag, negate, got, want)


def test_rand_augment_transform_executed_config_parity():
    """rand_augment_transform executed (rand_augment.py:487-537) vs our
    parse_config + OPS table, per config string: num_layers, magnitude,
    magnitude_std, per-op prob, and the exact transform list selected —
    including the 'inc0' quirk (bool("0") is truthy, so ANY inc token picks
    the increasing family, which our parser mirrors)."""
    ra = load_reference_rand_augment()
    # reverse map: (aug_fn, level_fn) uniquely identifies a transform name
    rev = {(ra.NAME_TO_OP[n], ra.LEVEL_TO_ARG[n]): n for n in ra.NAME_TO_OP}

    for config in ("rand-m9-mstd0.5-inc1", "rand-m7-n4-mstd0.5",
                   "rand-m5-n3-inc0", "rand-mstd1"):
        t = ra.rand_augment_transform(config, {"img_mean": (124, 116, 104)})
        m, n, mstd, inc = RA.parse_config(config)
        assert t.num_layers == n, config
        ref_names = [rev[(op.aug_fn, op.level_fn)] for op in t.ops]
        want_names = [_ref_name(name, inc) for name, _ in RA.OPS]
        assert sorted(ref_names) == sorted(want_names), config
        for op in t.ops:
            assert op.magnitude == m, config
            assert op.prob == 0.5, config        # fixed (rand_augment.py:463)
            assert op.magnitude_std == mstd, config


def test_magnitude_std_clip_rule_executed(monkeypatch):
    """AugmentOp clips the gaussian-jittered magnitude to [0, 10]
    (rand_augment.py:374-376 ``min(_MAX_LEVEL, max(0, magnitude))``) BEFORE
    the level map — the same clip our rand_augment applies
    (data/randaugment.py:345).  Executed with random.gauss pinned beyond
    both bounds."""
    ra = load_reference_rand_augment()
    op = ra.AugmentOp("Rotate", prob=1.0, magnitude=9,
                      hparams={"magnitude_std": 0.5,
                               "img_mean": (128, 128, 128)})
    monkeypatch.setattr(ra.random, "random", lambda: 0.0)  # keep positive
    for gauss_draw, want_deg in ((13.0, 30.0), (-2.0, 0.0), (5.0, 15.0)):
        monkeypatch.setattr(ra.random, "gauss",
                            lambda mu, sigma, g=gauss_draw: g)
        captured = {}
        monkeypatch.setattr(
            op, "aug_fn", lambda img, *args, **kw: captured.update(a=args)
            or img)
        op(object())
        assert captured["a"][0] == pytest.approx(want_deg)
        # our pipeline clips the level identically before the map
        monkeypatch.setattr(jax.random, "bernoulli",
                            lambda key, p=0.5, shape=None: jnp.asarray(True))
        ours = float(RA._magnitude("Rotate",
                                   jnp.clip(jnp.float32(gauss_draw), 0.0,
                                            10.0),
                                   jax.random.PRNGKey(0), IMG_SIZE))
        assert ours == pytest.approx(want_deg, abs=2e-5)


def test_solarize_add_executed_pixels():
    """solarize_add is hand-written in the reference (rand_augment.py:
    164-176, a 256-entry LUT: +add below thresh, clipped to 255) — execute
    it vs our vectorized op, exact."""
    ra = load_reference_rand_augment()
    from PIL import Image

    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (24, 24, 3), np.uint8)
    for add in (30, 64, 110):  # ours fixes thresh=128 like the level map
        want = np.asarray(ra.solarize_add(Image.fromarray(img), add,
                                          thresh=128))
        got = np.asarray(RA.solarize_add(jnp.asarray(img, jnp.float32),
                                         jnp.float32(add)))
        np.testing.assert_array_equal(got.astype(np.uint8), want)


def _load_reference_random_erasing():
    """video_datasets/random_erasing.py executed (math/random/torch only;
    file-path import — video_datasets has no __init__.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_random_erasing",
        "/root/reference/video_datasets/random_erasing.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("case", ["first_fit", "retry"])
def test_random_erasing_executed_box_parity(monkeypatch, case):
    """RandomErasing._erase executed (random_erasing.py:91-117: up-to-10
    (area, aspect) draws, first STRICTLY-fitting box wins, inclusive-range
    integer corner) vs our lax.fori_loop port, both fed the same underlying
    uniform draws.  The 'retry' case forces the first draw to overflow the
    image so the reject-and-redraw path is exercised on both sides."""
    re_mod = _load_reference_random_erasing()
    H = W = 24
    if case == "first_fit":
        tries = [(0.20, 0.30, 0.40, 0.70)]      # (u_area, u_ar, u_top, u_left)
    else:
        # u_area=0.999 on a 24x24 image with max_area=1/3 and a tall aspect
        # draw: h = round(sqrt(0.33*576 * ar)) with ar near max -> h >= 24
        tries = [(0.999999, 0.999999, None, None), (0.10, 0.45, 0.25, 0.85)]

    # --- reference: scripted random.uniform / random.randint ----------------
    ref_uniforms = []
    ref_ints = []
    for t in tries:
        ref_uniforms += [t[0], t[1]]
        if t[2] is not None:
            ref_ints += [t[2], t[3]]
    monkeypatch.setattr(re_mod.random, "uniform",
                        lambda a, b: a + ref_uniforms.pop(0) * (b - a))
    monkeypatch.setattr(
        re_mod.random, "randint",
        lambda low, high: int(ref_ints.pop(0) * (high - low + 1)) + low)
    monkeypatch.setattr(re_mod.random, "random", lambda: 0.0)  # prob gate on
    # marker fill instead of gaussian noise so the erased box is readable
    monkeypatch.setattr(
        re_mod, "_get_pixels",
        lambda per_pixel, rand_color, patch_size, dtype=torch.float32,
        device="cpu": torch.full(patch_size, 777.0, dtype=dtype))
    re = re_mod.RandomErasing(probability=1.0, mode="pixel", cube=False,
                              device="cpu")
    img_t = torch.zeros(3, H, W)
    re(img_t)
    want_mask = (img_t[0].numpy() == 777.0)
    assert want_mask.any(), "reference erased nothing — bad test setup"

    # --- ours: the same draws through jax.random ---------------------------
    ours_uniforms = []
    for t in tries:
        # our loop body always draws (area, ar, top, left); the corner draws
        # are discarded on non-fitting tries
        ours_uniforms += [t[0], t[1], t[2] or 0.0, t[3] or 0.0]
    ours_uniforms += [0.0, 0.0, 0.0, 0.0] * (10 - len(tries))  # no-op tail
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0:
        jnp.float32(minval + ours_uniforms.pop(0) * (maxval - minval)))
    # run the retry loop EAGERLY: under the real lax.fori_loop the body is
    # traced once, so a scripted-draw patch could not feed per-try values
    import functools

    monkeypatch.setattr(
        jax.lax, "fori_loop",
        lambda lo, hi, body, init: functools.reduce(
            lambda c, i: body(i, c), range(lo, hi), init))
    out = RA.random_erasing(jax.random.PRNGKey(0),
                            jnp.zeros((H, W, 3), jnp.float32), prob=1.0)
    got_mask = np.asarray(out[..., 0] != 0.0)
    np.testing.assert_array_equal(got_mask, want_mask)


def test_vtab_registry_and_filelist_executed(tmp_path):
    """datasets/vtab.py executed: the 19-task registry + class counts
    (:8-33) vs our VTAB_TASKS dict, and default_flist_reader/ImageFilelist
    (:41-74) vs our parse_filelist on the same list file, with the decoded
    sample pinned to the executed loader's RGB conversion."""
    from PIL import Image

    from dynamic_tuning_tpu.data.vtab import (ALIASES, VTAB_TASKS,
                                              parse_filelist,
                                              vtab_num_classes)
    from reference_oracle import load_reference_vtab

    ref = load_reference_vtab()

    # registry: same tasks (4 collide with fine-grained dataset names and
    # carry our _vtab suffix, resolved through ALIASES), same class counts
    want = dict(zip(ref._DATASET_NAME, ref._CLASSES_NUM))
    assert {ALIASES.get(k, k) for k in want} == set(VTAB_TASKS)
    for task in ref._DATASET_NAME:
        assert vtab_num_classes(task) == ref.get_classes_num(task), task

    # file-list protocol: `relative/path label` lines
    rs = np.random.RandomState(11)
    root = tmp_path / "images"
    root.mkdir()
    entries = []
    for i, lab in enumerate((3, 0, 17)):
        arr = rs.randint(0, 256, (8, 8, 3), np.uint8)
        name = f"img_{i}.png"
        Image.fromarray(arr).save(root / name)
        entries.append((name, lab))
    flist = tmp_path / "train800.txt"
    flist.write_text("".join(f"{n} {l}\n" for n, l in entries))

    assert parse_filelist(str(flist)) == ref.default_flist_reader(str(flist))

    ds = ref.ImageFilelist(root=str(root), flist=str(flist))
    assert len(ds) == len(entries)
    for i, (name, lab) in enumerate(entries):
        img, target = ds[i]
        assert target == lab
        np.testing.assert_array_equal(
            np.asarray(img), np.asarray(
                Image.open(root / name).convert("RGB")))


def _load_reference_pos_embed(monkeypatch):
    """util/pos_embed.py executed (numpy+torch only).  Environment shim:
    its sincos helper uses the numpy<2 ``np.float`` alias
    (util/pos_embed.py:55) — restored as the builtin it aliased."""
    import importlib

    from reference_oracle import _install_import_environment

    monkeypatch.setattr(np, "float", float, raising=False)
    _install_import_environment()
    mod = importlib.import_module("util.pos_embed")
    assert mod.__file__.startswith("/root/reference")
    return mod


def test_sincos_pos_embed_executed(monkeypatch):
    """get_2d_sincos_pos_embed executed (util/pos_embed.py:20-68) vs ours,
    with and without the zero CLS row."""
    from dynamic_tuning_tpu.utils.pos_embed import get_2d_sincos_pos_embed

    ref = _load_reference_pos_embed(monkeypatch)
    for dim, gs, cls in ((16, 4, False), (64, 7, True), (32, 14, True)):
        want = ref.get_2d_sincos_pos_embed(dim, gs, cls_token=cls)
        got = get_2d_sincos_pos_embed(dim, gs, cls_token=cls)
        np.testing.assert_allclose(got, want, atol=1e-7)


def test_interpolate_pos_embed_executed(monkeypatch):
    """Pos-embed grid resize: image interpolate_pos_embed_ori executed
    (util/pos_embed.py:106-127, grid 14->7, CLS row kept) vs our numpy
    A=-0.75 implementation, which the import path (train/checkpoint.py:
    137-139) calls live.  Note: the reference defines this but every call
    site is commented out (main_image.py imports it at :26 and never calls
    it; main_video.py:272 / main_vtab.py:229 are comments) — ours running
    it on grid mismatch is a deliberate robustness extension, pinned here
    against the executed function itself."""
    from types import SimpleNamespace

    from dynamic_tuning_tpu.utils.pos_embed import interpolate_pos_embed

    ref = _load_reference_pos_embed(monkeypatch)
    rs = np.random.RandomState(5)
    DIM = 32

    old, new = 14, 7
    pe = rs.randn(1, 1 + old * old, DIM).astype(np.float32)
    model = SimpleNamespace(
        patch_embed=SimpleNamespace(num_patches=new * new),
        pos_embed=torch.zeros(1, 1 + new * new, DIM))
    ckpt = {"pos_embed": torch.from_numpy(pe.copy())}
    ref.interpolate_pos_embed_ori(model, ckpt)
    want = ckpt["pos_embed"].numpy()
    got = interpolate_pos_embed(pe, new * new, num_prefix_tokens=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_array_equal(got[:, 0], pe[0, 0][None])  # CLS untouched


def test_video_interpolate_dead_code_is_broken_and_ours_works(monkeypatch):
    """The reference's VIDEO pos-embed interpolation (util/pos_embed.py:
    75-104) is dead code (no live call site) and, executed, CRASHES on any
    genuine grid mismatch: it derives orig_size from the sqrt of the TOTAL
    (time*space) token count (:84) but then reshapes per-time-group (:94) —
    the sizes can never agree when time groups > 1.  Pinned by execution to
    document why our interpolate_pos_embed_video deviates: it resizes each
    time group's spatial grid, equal to the (executed-pinned) image resize
    applied per group."""
    from types import SimpleNamespace

    from dynamic_tuning_tpu.utils.pos_embed import (
        interpolate_pos_embed, interpolate_pos_embed_video)

    ref = _load_reference_pos_embed(monkeypatch)
    rs = np.random.RandomState(6)
    DIM, old, new, frames, tub = 32, 14, 7, 8, 2
    tg = frames // tub
    pe = rs.randn(1, tg * old * old, DIM).astype(np.float32)
    model = SimpleNamespace(
        patch_embed=SimpleNamespace(num_patches=tg * new * new,
                                    tubelet_size=tub),
        pos_embed=torch.zeros(1, tg * new * new, DIM))
    with pytest.raises(RuntimeError, match="invalid for input"):
        ref.interpolate_pos_embed(model, {"pos_embed": torch.from_numpy(pe)},
                                  SimpleNamespace(num_frames=frames))

    got = interpolate_pos_embed_video(pe, new * new, num_frames=frames,
                                      tubelet_size=tub, num_prefix_tokens=0)
    assert got.shape == (1, tg * new * new, DIM)
    # per-group equivalence with the image resize pinned above
    for g in range(tg):
        grp = pe[:, g * old * old:(g + 1) * old * old]
        want_g = interpolate_pos_embed(grp, new * new, num_prefix_tokens=0)
        np.testing.assert_allclose(
            got[:, g * new * new:(g + 1) * new * new], want_g, atol=1e-6)


def test_random_resized_crop_get_params_executed(monkeypatch):
    """util/crop.py get_params executed (the BYOL single-draw variant:
    round-then-clamp dims, integer-uniform corner — crop.py:24-45) vs our
    _sample_crop_box, both frameworks fed the same four uniform draws."""
    crop = load_reference_crop()
    from PIL import Image

    rs = np.random.RandomState(7)
    cases = [tuple(rs.rand(4)) for _ in range(24)]
    cases += [(0.0, 0.0, 0.0, 0.0), (0.999999, 0.999999, 0.999999, 0.999999),
              (0.999999, 0.0, 0.5, 0.5), (0.03, 0.999999, 0.999999, 0.0)]
    scale, ratio = (0.08, 1.0), (3 / 4, 4 / 3)

    for h, w in ((32, 32), (48, 32), (32, 48), (37, 53)):
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        for u_area, u_ratio, u_top, u_left in cases:
            draws = [u_area, u_ratio]
            monkeypatch.setattr(
                torch.Tensor, "uniform_",
                lambda self, a=0.0, b=1.0, *, generator=None:
                self.fill_(a + draws.pop(0) * (b - a)))
            ints = [u_top, u_left]
            monkeypatch.setattr(
                torch, "randint",
                lambda low, high, size=(1,), **kw:
                torch.tensor([int(ints.pop(0) * (high - low)) + low]))
            i, j, ch_t, cw_t = crop.RandomResizedCrop.get_params(
                img, scale, ratio)

            us = [u_area, u_ratio, u_top, u_left]
            monkeypatch.setattr(
                jax.random, "uniform",
                lambda key, shape=(), dtype=jnp.float32, minval=0.0,
                maxval=1.0: jnp.float32(minval
                                        + us.pop(0) * (maxval - minval)))
            top, left, ch, cw = _sample_crop_box(
                jax.random.PRNGKey(0), h, w, scale, ratio)
            assert (int(top), int(left), int(ch), int(cw)) == \
                (i, j, ch_t, cw_t), (h, w, u_area, u_ratio, u_top, u_left)
