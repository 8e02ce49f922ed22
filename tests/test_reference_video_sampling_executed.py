"""Video sampling/crop PROTOCOL parity against the reference's OWN executed
dataset code.

The transcription tests in test_video.py pin our samplers against the
formulas we read out of ``video_datasets/k400.py``; these tests execute the
reference's own files instead (loaded unmodified by
:func:`reference_oracle.load_reference_video_datasets`):

  * ``k400.py`` / ``sthv2_dataset.py`` (line-identical sampler methods,
    both executed): the train random-segment/TSN sampler
    (``_random_sample_frame_idx``, k400.py:305-320) with numpy's global RNG
    seed-matched to our RandomState, the eval temporal-view index protocol
    (``get_temporal_crops_index``, k400.py:225-248), the tensor-level
    temporal crops incl. the short-video last-frame padding
    (``_generate_temporal_crops``) vs our clamped-index gather, and the
    1-/3-view spatial crops (``_generate_spatial_crops``) vs
    ``VideoDataset.spatial_crops``.
  * ``transform.py``: the 10-try crop-box sampler
    (``_get_param_spatial_crop``, transform.py:504-543) executed with its
    ``random.uniform``/``random.randint`` draws scripted to OUR jax draws —
    first-valid-candidate selection, int-round box dims, and the
    ratio-clamped center fallback must reproduce our
    ``_sample_crop_box_10try`` box exactly; plus ``create_random_augment``
    (transform.py:628-660) whose translate_const/interpolation glue and
    Compose wrapping are checked against our config parse.

Pixel-level resize kernels are intentionally NOT compared here: our
on-device transforms fuse crop+resize with jax cubic (documented deviation,
BENCH.md), while index/box protocols must be exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.data import randaugment as RA
from dynamic_tuning_tpu.data.video import (VideoDataset,
                                           sample_indices_random,
                                           sample_indices_test,
                                           sample_indices_tsn)
from dynamic_tuning_tpu.data.video_transforms import _sample_crop_box_10try

from reference_oracle import (load_reference_video_datasets,
                              reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")


def _ref_dataset(cls, *, rate, num_frames, temporal_views=1,
                 spatial_views=1, spatial_size=224):
    """Instantiate the reference dataset WITHOUT __init__ (it opens list
    files and probes decode backends); set exactly the attributes the
    sampler methods read."""
    ds = object.__new__(cls)
    ds.sampling_rate = rate
    ds.num_frames = num_frames
    ds.num_temporal_views = temporal_views
    ds.num_spatial_views = spatial_views
    ds.spatial_size = spatial_size
    return ds


def _both_classes():
    mods = load_reference_video_datasets()
    return [mods["k400"].VideoDataset, mods["sthv2"].SthV2VideoDataset]


# ---------------------------------------------------------------- samplers


@pytest.mark.parametrize("rate,T", [(16, 8), (8, 8), (4, 16), (0, 8)])
@pytest.mark.parametrize("L", [300, 128, 120, 113, 48, 17, 9, 8])
def test_train_sampler_executed(rate, T, L):
    """k400.py:305-320 executed, all three branches (TSN / short / normal),
    numpy global seed vs our RandomState — identical MT19937 draw streams,
    so indices must match exactly."""
    for cls in _both_classes():
        ds = _ref_dataset(cls, rate=rate, num_frames=T)
        for seed in range(5):
            np.random.seed(seed)
            ref = ds._random_sample_frame_idx(L)
            rs = np.random.RandomState(seed)
            if rate <= 0:
                ours = sample_indices_tsn(L, T, rs)
            else:
                ours = sample_indices_random(L, T, rate, rs)
            assert list(ref) == ours.tolist(), (cls.__name__, seed)


@pytest.mark.parametrize("rate,T,V", [(16, 8, 3), (16, 8, 1), (8, 8, 3),
                                      (4, 16, 5), (0, 8, 1)])
@pytest.mark.parametrize("L", [300, 129, 128, 127, 48, 17, 8])
def test_eval_temporal_views_executed(rate, T, V, L):
    """k400.py:225-248 executed: per-view start positions and last-frame
    clamping for every (rate, views, length) cell."""
    for cls in _both_classes():
        ds = _ref_dataset(cls, rate=rate, num_frames=T, temporal_views=V)
        ref = ds.get_temporal_crops_index(L)
        assert len(ref) == V
        for v in range(V):
            ours = sample_indices_test(L, T, rate, v, V)
            assert list(ref[v]) == ours.tolist(), (cls.__name__, v)


@pytest.mark.parametrize("rate,T,V", [(16, 8, 3), (16, 8, 1), (0, 8, 1)])
@pytest.mark.parametrize("L", [300, 129, 48, 17, 8])
def test_temporal_crop_tensor_executed(rate, T, V, L):
    """k400.py:251-278 executed on frame-index-tagged tensors: the
    reference PADS short videos with the last frame then slices; we clamp
    indices to the last frame — the gathered frames must be identical."""
    mods = load_reference_video_datasets()
    ds = _ref_dataset(mods["k400"].VideoDataset, rate=rate, num_frames=T,
                      temporal_views=V)
    import torch
    frames = torch.arange(L, dtype=torch.float32).view(1, L, 1, 1)
    ref_crops = ds._generate_temporal_crops(frames)
    assert len(ref_crops) == V
    for v, crop in enumerate(ref_crops):
        ours = sample_indices_test(L, T, rate, v, V)
        assert crop.flatten().tolist() == ours.tolist(), v


@pytest.mark.parametrize("views,H,W", [(1, 256, 320), (1, 224, 224),
                                       (3, 224, 280), (3, 300, 224),
                                       (3, 224, 225)])
def test_spatial_crops_executed(views, H, W):
    """k400.py:281-300 executed on coordinate-tagged frames vs our
    VideoDataset.spatial_crops ([T,H,W,C] layout): same offsets along the
    long axis, same center crop."""
    mods = load_reference_video_datasets()
    size = 224
    ds = _ref_dataset(mods["k400"].VideoDataset, rate=16, num_frames=8,
                      spatial_views=views, spatial_size=size)
    import torch
    tag = np.arange(H * W, dtype=np.float32).reshape(H, W)
    ref_in = torch.as_tensor(tag).view(1, 1, H, W).repeat(1, 2, 1, 1)
    ref_crops = ds._generate_spatial_crops(ref_in)

    ours_in = tag.reshape(1, H, W, 1)
    our_crops = VideoDataset.spatial_crops(ours_in, size, views)

    assert len(ref_crops) == len(our_crops) == (views if views != 1 else 1)
    for rc, oc in zip(ref_crops, our_crops):
        ref_hw = rc[0, 0].numpy()
        our_hw = oc[0, :, :, 0]
        np.testing.assert_array_equal(ref_hw, our_hw)


# ----------------------------------------------------- 10-try crop box


class _ScriptedDraws:
    """Feed the reference's random.uniform/random.randint the exact values
    behind OUR jax draws, in the reference's call order."""

    def __init__(self, scale_draws, log_aspect_draws, top, left):
        self._uniform = []
        for s, a in zip(scale_draws, log_aspect_draws):
            self._uniform += [float(s), float(a)]
        self._randint = [int(top), int(left)]

    def uniform(self, lo, hi):
        v = self._uniform.pop(0)
        assert lo - 1e-6 <= v <= hi + 1e-6, (lo, v, hi)
        return v

    def randint(self, lo, hi):
        v = self._randint.pop(0)
        assert lo <= v <= hi, (lo, v, hi)  # randint is INCLUSIVE here
        return v


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("H,W", [(256, 320), (224, 224), (130, 640)])
def test_crop_box_10try_executed_matched_draws(seed, H, W):
    """transform.py:504-543 executed with draws scripted to ours: the
    first-valid-candidate walk, int(round(sqrt(...))) box dims and the
    inclusive randint corner must reproduce our vectorized box exactly."""
    mods = load_reference_video_datasets()
    tr = mods["transform"]
    scale, ratio = (0.08, 1.0), (3 / 4, 4 / 3)

    rng = jax.random.PRNGKey(seed)
    top, left, ch, cw = (float(x) for x in
                         _sample_crop_box_10try(rng, H, W, scale, ratio))

    # replicate our draw derivation (same keys, same order)
    k_area, k_ratio, k_top, k_left = jax.random.split(rng, 4)
    u_scale = np.asarray(jax.random.uniform(
        k_area, (10,), minval=scale[0], maxval=scale[1]))
    u_logr = np.asarray(jax.random.uniform(
        k_ratio, (10,), minval=np.log(ratio[0]), maxval=np.log(ratio[1])))

    # how many candidates does the reference consume? same validity math
    area = H * W
    ws = np.round(np.sqrt(area * u_scale * np.exp(u_logr)))
    hs = np.round(np.sqrt(area * u_scale / np.exp(u_logr)))
    valid = (ws > 0) & (ws <= W) & (hs > 0) & (hs <= H)
    if valid.any():
        k = int(np.argmax(valid)) + 1
        draws = _ScriptedDraws(u_scale[:k], u_logr[:k], top, left)
    else:
        # all 10 candidates rejected (extreme aspect): the reference
        # consumes all 10 draw pairs then takes the deterministic
        # ratio-clamped center fallback — ours must land there too
        k = 10
        draws = _ScriptedDraws(u_scale, u_logr, top, left)
        draws._randint = []  # fallback path draws no corners
    orig_uniform, orig_randint = tr.random.uniform, tr.random.randint
    tr.random.uniform = draws.uniform
    tr.random.randint = draws.randint
    try:
        i, j, h, w = tr._get_param_spatial_crop(scale, ratio, H, W)
    finally:
        tr.random.uniform, tr.random.randint = orig_uniform, orig_randint

    assert (i, j, h, w) == (int(top), int(left), int(ch), int(cw))
    assert not draws._uniform and not draws._randint  # call-count parity


@pytest.mark.parametrize("H,W,ratio", [
    (224, 224, (3 / 4, 4 / 3)),   # whole-image fallback
    (100, 400, (3 / 4, 4 / 3)),   # in_ratio > max(ratio): h = H
    (400, 100, (3 / 4, 4 / 3)),   # in_ratio < min(ratio): w = W
])
def test_crop_box_fallback_executed(H, W, ratio):
    """The 10-try fallback (transform.py:530-543) is deterministic: force
    all candidates invalid via scale > 1 and compare the ratio-clamped
    center box."""
    mods = load_reference_video_datasets()
    tr = mods["transform"]
    scale = (2.0, 2.0)  # target_area > area -> every candidate too big

    i, j, h, w = tr._get_param_spatial_crop(scale, ratio, H, W)
    top, left, ch, cw = (int(x) for x in _sample_crop_box_10try(
        jax.random.PRNGKey(0), H, W, scale, ratio))
    assert (i, j, h, w) == (top, left, ch, cw)


# ------------------------------------------------ create_random_augment


def test_create_random_augment_executed_glue():
    """transform.py:628-660 executed: the Compose wrapper, translate_const
    = int(0.45 * min(input_size)) and interpolation plumbing must agree
    with our parse of the same config string (the K400 recipe's
    rand-m7-n4-mstd0.5-inc1, k400.py:37)."""
    mods = load_reference_video_datasets()
    tr = mods["transform"]
    cfg = "rand-m7-n4-mstd0.5-inc1"

    comp = tr.create_random_augment((224, 224), auto_augment=cfg,
                                    interpolation="bicubic")
    (ra,) = comp.transforms  # the reference wraps exactly one transform
    assert ra.num_layers == 4
    # hparams glue: translate_const from the min input side, PIL bicubic
    op_h = ra.ops[0].hparams
    assert op_h["translate_const"] == int(224 * 0.45)
    from PIL import Image
    assert op_h["interpolation"] == Image.BICUBIC

    magnitude, num_layers, mstd, increasing = RA.parse_config(cfg)
    assert (num_layers, mstd) == (ra.num_layers,
                                  ra.ops[0].hparams["magnitude_std"])
    assert magnitude == ra.ops[0].magnitude
    assert increasing  # inc1 selects the increasing transform list
    # op COUNT from the increasing list (the per-op semantics parity lives
    # in test_reference_data_executed.py); no choice weights in the recipe
    import sys as _sys
    ref_ra = _sys.modules["reference_video_datasets.rand_augment"]
    assert len(ra.ops) == len(ref_ra._RAND_INCREASING_TRANSFORMS)
    assert ra.choice_weights is None
