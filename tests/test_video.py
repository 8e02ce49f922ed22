"""Video model + data tests (reference video_models/, video_datasets/)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.data import video as V
from dynamic_tuning_tpu.data.video_transforms import augment_clip_batch
from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer


def _tiny_video_model():
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=12, embed_dim=64,
                      depth=2, num_heads=4, num_frames=3)
    return VideoVisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                                  select=SelectConfig(), dtype=jnp.float32), cfg


def test_video_forward_shapes():
    model, cfg = _tiny_video_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    logits, aux = model.apply({"params": params}, x)
    assert logits.shape == (2, 12)
    # per-frame gates: leading dim B*T (reference folds time into batch)
    assert aux["token_select"].shape == (6, cfg.depth, cfg.num_patches, 1)
    assert "query_token" in params and "attentive_blocks" in params


def test_video_query_zero_init_and_cross_attn_params():
    model, _ = _tiny_video_model()
    x = jnp.zeros((1, 3, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    np.testing.assert_array_equal(np.asarray(params["query_token"]), 0.0)
    ca = params["attentive_blocks"]["cross_attn"]
    assert set(ca) >= {"q", "k", "v", "proj", "q_bias", "v_bias"}
    assert "bias" not in ca["q"]  # biases are separate explicit params


def test_video_train_step_runs():
    from dynamic_tuning_tpu.train.engine import (create_train_state,
                                                 make_train_step,
                                                 model_apply_fn)
    from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params
    from dynamic_tuning_tpu.train.video_runner import VideoRunner

    model, _ = _tiny_video_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32, 3))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    tr, fr = partition_params(params, VideoRunner._trainable_pred)
    # query token and attentive pooling must be trainable (missing from ckpt)
    assert any(k[0] == "query_token" for k in tr)
    assert any(k[0] == "attentive_blocks" for k in tr)
    tx = make_optimizer(1e-3, steps_per_epoch=10)
    st = create_train_state(tr, fr, tx, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(model_apply_fn(model), tx, SelectConfig()))
    st, parts = step(st, x, y)
    assert np.isfinite(float(parts["loss"]))


def test_sampling_random_segment():
    rs = np.random.RandomState(0)
    idx = V.sample_indices_random(300, 8, 16, rs)
    assert idx.shape == (8,)
    assert (np.diff(idx) == 16).all()
    assert idx.max() < 300
    # short video: linspace fallback
    idx2 = V.sample_indices_random(10, 8, 16, rs)
    assert idx2.max() <= 9 and idx2.shape == (8,)


def test_sampling_tsn_covers_segments():
    idx = V.sample_indices_tsn(160, 8, None)
    assert idx.shape == (8,)
    assert (np.diff(idx) > 0).all()
    assert idx[0] >= 0 and idx[-1] < 160


def test_test_sampling_distinct_views():
    a = V.sample_indices_test(400, 8, 16, 0, 3)
    b = V.sample_indices_test(400, 8, 16, 2, 3)
    assert not np.array_equal(a, b)


def test_dummy_video_and_multiview_builder():
    tr, va, nc = V.build_video_dataset("synthetic", "", clip_len=4)
    clip, lab = tr[0]
    assert clip.shape == (4, 256, 256, 3)
    views, lab2 = va[0]
    assert views.shape == (3, 4, 256, 256, 3)
    assert nc == 400


def test_augment_clip_batch_shapes():
    clips = jnp.asarray(np.random.randint(0, 256, (2, 4, 64, 64, 3), np.uint8))
    out = augment_clip_batch(jax.random.PRNGKey(0), clips, crop=32,
                             min_size=40, max_size=56, train=True)
    assert out.shape == (2, 4, 32, 32, 3)
    # temporal consistency: same crop across frames -> identical frames stay identical
    same = jnp.asarray(np.tile(np.random.randint(0, 256, (1, 1, 64, 64, 3),
                                                 np.uint8), (1, 4, 1, 1, 1)))
    o = augment_clip_batch(jax.random.PRNGKey(1), same, crop=32,
                           min_size=40, max_size=56, train=True)
    np.testing.assert_allclose(np.asarray(o[0, 0]), np.asarray(o[0, 3]),
                               rtol=1e-5, atol=1e-5)
    ev = augment_clip_batch(jax.random.PRNGKey(0), clips, crop=32,
                            min_size=40, max_size=56, train=False)
    assert ev.shape == (2, 4, 32, 32, 3)


def test_clip_random_resized_crop_box_stats():
    """One RRC box per clip (reference transform.py:546-585): output shape,
    temporal consistency, and area-fraction distribution within scale range."""
    from dynamic_tuning_tpu.data.video_transforms import clip_random_resized_crop

    clip = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (3, 48, 64, 3), np.uint8))
    out = clip_random_resized_crop(jax.random.PRNGKey(0), clip, crop=32)
    assert out.shape == (3, 32, 32, 3)
    # tight scale -> near-full-frame crop reproduces a plain resize
    full = clip_random_resized_crop(jax.random.PRNGKey(1), clip, crop=32,
                                    scale=(0.9999, 1.0), ratio=(0.9999, 1.0))
    ref = jax.image.resize(clip.astype(jnp.float32), (3, 32, 32, 3),
                           "bilinear")
    # same box applied to every frame
    same = jnp.asarray(np.tile(clip[:1], (3, 1, 1, 1)))
    o = clip_random_resized_crop(jax.random.PRNGKey(2), same, crop=32)
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(o[2]), atol=1e-4)


def test_clip_color_jitter_semantics():
    """brightness alpha scales pixels; saturation alpha=1-limit pulls toward
    Rec.601 luma; zero strengths = identity (reference transform.py:321-412)."""
    from dynamic_tuning_tpu.data.video_transforms import (clip_color_jitter,
                                                          _grayscale)

    clip = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3) * 255,
                       jnp.float32)
    out = clip_color_jitter(jax.random.PRNGKey(0), clip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip), atol=1e-5)

    # brightness-only: out = alpha * clip for some alpha in [0.6, 1.4]
    out = clip_color_jitter(jax.random.PRNGKey(1), clip, brightness=0.4)
    alpha = np.asarray(out).ravel()[0] / np.asarray(clip).ravel()[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip) * alpha,
                               rtol=1e-4)
    assert 0.6 <= alpha <= 1.4

    # saturation: a grayscale clip is a fixed point
    gray = _grayscale(clip)
    out = clip_color_jitter(jax.random.PRNGKey(2), gray, saturation=0.4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gray), rtol=1e-3,
                               atol=1e-2)

    # distribution: brightness alphas spread over the range
    alphas = []
    for i in range(64):
        o = clip_color_jitter(jax.random.PRNGKey(i), clip, brightness=0.4)
        alphas.append(float(np.asarray(o).ravel()[0]
                            / np.asarray(clip).ravel()[0]))
    assert min(alphas) < 0.75 and max(alphas) > 1.25


def test_clip_lighting_jitter_pca():
    """Lighting noise adds a per-clip constant RGB shift along PCA directions
    (reference transform.py:413-460); alphastd=0 is identity."""
    from dynamic_tuning_tpu.data.video_transforms import clip_lighting_jitter

    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    clip = jnp.asarray(np.random.RandomState(2).rand(2, 6, 6, 3), jnp.float32)
    out = clip_lighting_jitter(jax.random.PRNGKey(0), clip, alphastd=0,
                               eigval=eigval, eigvec=eigvec)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(clip))
    out = clip_lighting_jitter(jax.random.PRNGKey(0), clip, alphastd=0.1,
                               eigval=eigval, eigvec=eigvec)
    shift = np.asarray(out - clip)
    # constant per channel across all pixels/frames
    for c in range(3):
        assert np.ptp(shift[..., c]) < 1e-6
    assert np.abs(shift).max() > 0


def test_augment_clip_batch_resize_types():
    from dynamic_tuning_tpu.data.video_transforms import augment_clip_batch

    clips = jnp.asarray(np.random.randint(0, 256, (2, 4, 64, 64, 3), np.uint8))
    for rt in ("random_resized_crop", "random_short_side_scale_jitter"):
        out = augment_clip_batch(jax.random.PRNGKey(0), clips, crop=32,
                                 min_size=40, max_size=56, train=True,
                                 resize_type=rt)
        assert out.shape == (2, 4, 32, 32, 3)


def test_video_tubelet_forward_and_import():
    """VideoMAE-style tubelet stem: tokens cover tubelet_size frames, the
    per-frame blocks run per frame GROUP, and a torch Conv3d patch stem
    imports OIDHW -> DHWIO (reference util/pos_embed.py:75-104 family)."""
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=12, embed_dim=64,
                      depth=2, num_heads=2, num_frames=4, tubelet_size=2)
    model = VideoVisionTransformer(cfg, tuning=TuningConfig(ffn_num=8,
                                                            d_model=64),
                                   select=SelectConfig(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    # 3-D conv stem: [t, p, p, C, D]
    assert params["patch_embed"]["proj"]["kernel"].shape == (2, 8, 8, 3, 64)
    logits, aux = model.apply({"params": params}, x)
    assert logits.shape == (2, 12)
    # gates fold over frame GROUPS: B * (T // tubelet) leading dim
    assert aux["token_select"].shape == (4, cfg.depth, cfg.num_patches, 1)

    # torch-side Conv3d import: OIDHW -> DHWIO
    from dynamic_tuning_tpu.train.checkpoint import import_pretrained
    rs = np.random.RandomState(0)
    w3d = rs.randn(64, 3, 2, 8, 8).astype(np.float32)
    sd = {"patch_embed.proj.weight": w3d}
    params2, _ = import_pretrained(params, sd)
    np.testing.assert_allclose(
        np.asarray(params2["patch_embed"]["proj"]["kernel"]),
        w3d.transpose(2, 3, 4, 1, 0))


def test_tb_taps_reconstruct_dense_matrix():
    """The 4-tap gather form of the resize (round-5 fix for the 19x decode
    regression the dense-einsum kernel caused, BENCH.md) must reproduce the
    dense torch-bicubic matrix EXACTLY — scatter the taps back and compare
    bitwise, across up/down/identity scales and awkward sizes."""
    from dynamic_tuning_tpu.data.video import _tb_matrix, _tb_taps

    for n_in, n_out in [(240, 256), (320, 341), (64, 224), (224, 64),
                        (7, 13), (13, 7), (100, 100), (1, 5), (5, 1)]:
        m = _tb_matrix(n_in, n_out)
        idx, wts = _tb_taps(n_in, n_out)
        back = np.zeros_like(m)
        for i in range(n_out):
            for j in range(4):
                back[i, idx[i, j]] += wts[i, j]
        np.testing.assert_array_equal(back, m, err_msg=str((n_in, n_out)))


def test_native_resize_matches_numpy():
    """The C resize (native/dyt_video.cpp::dyt_resize_bicubic — GIL-free,
    vectorized) must match the numpy tap form within the house +-1 uint8
    rounding tolerance: same taps, same float32 pair-order arithmetic; the
    only freedom is last-ulp float ordering at .5 rounding boundaries."""
    import os

    from dynamic_tuning_tpu.data import native_video
    from dynamic_tuning_tpu.data.video import _bicubic_resize, _tb_taps

    if not native_video.available():
        pytest.skip("native video library unavailable")
    rs = np.random.RandomState(1)
    for (h, w, nh, nw) in [(240, 320, 256, 341), (90, 120, 224, 298),
                           (64, 64, 320, 320), (240, 320, 64, 48),
                           (7, 13, 29, 31)]:
        img = rs.randint(0, 256, (h, w, 3), np.uint8)
        ih, wh = _tb_taps(h, nh)
        iw, ww = _tb_taps(w, nw)
        got = native_video.resize_bicubic(img, nh, nw, ih, wh, iw, ww)
        assert got is not None
        os.environ["DYT_NATIVE_RESIZE"] = "0"
        try:
            ref = _bicubic_resize(img, nw, nh)
        finally:
            os.environ.pop("DYT_NATIVE_RESIZE", None)
        assert got.shape == ref.shape == (nh, nw, 3)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, \
            (h, w, nh, nw)


def test_decode_routes_through_native_resize(monkeypatch, tmp_path):
    """Wiring guard: VideoDataset._decode must actually CALL the C resize
    when the native library is present (a silent fallback to the numpy
    path is exactly how the 19x decode regression class hides — the
    parity tests stay green while throughput collapses)."""
    import dynamic_tuning_tpu.data.native_video as nv
    from dynamic_tuning_tpu.data import video as V

    if not nv.available():
        pytest.skip("native video library unavailable")
    calls = []
    real = nv.resize_bicubic

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(nv, "resize_bicubic", spy)
    img = np.arange(240 * 320 * 3, dtype=np.uint8).reshape(240, 320, 3)
    out = V._resize_short_side(img, 64)
    assert out.shape == (64, 64, 3)
    assert calls, "C resize was not invoked by the decode path"


def test_video_resize_matches_torch_bicubic():
    """The CPU video resize must reproduce the reference's kernel exactly:
    torch F.interpolate(mode='bicubic', align_corners=False)
    (k400.py:195-203, interpolation='bicubic' default) — within the uint8
    round (reference resizes unclamped floats; weights sum to 1 so the
    affine normalize commutes)."""
    import torch
    import torch.nn.functional as F

    from dynamic_tuning_tpu.data.video import _bicubic_resize

    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (90, 120, 3), np.uint8)
    for nh, nw in [(224, 298), (48, 64), (120, 90)]:
        got = _bicubic_resize(img, nw, nh).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None],
            size=(nh, nw), mode="bicubic", align_corners=False
        )[0].permute(1, 2, 0).numpy()
        ref = np.clip(ref + 0.5, 0, 255).astype(np.float32)
        assert np.abs(got - np.floor(ref)).max() <= 1, (nh, nw)


def test_samplers_match_reference_formulas():
    """Literal transcription of the reference sampling math
    (k400.py:225-248 get_temporal_crops_index, :305-320
    _random_sample_frame_idx) vs our samplers, across awkward lengths."""
    from dynamic_tuning_tpu.data.video import (sample_indices_random,
                                               sample_indices_test,
                                               sample_indices_tsn)

    def ref_test(n, clip, rate, views):
        if rate <= 0:
            seg = (n - 1) / clip
            return [[(round(seg * i) + round(seg * (i + 1))) // 2
                     for i in range(clip)]]
        seg_len = (clip - 1) * rate + 1
        slide = max(n - seg_len, 0)
        out = []
        for v in range(views):
            st = slide // 2 if views == 1 else round(slide / (views - 1) * v)
            out.append([min(p + st, n - 1)
                        for p in range(0, clip * rate, rate)])
        return out

    for n in (10, 50, 59, 100, 113, 128, 150, 300):
        for views in (1, 3):
            ref = ref_test(n, 8, 16, views)
            for v in range(views):
                got = sample_indices_test(n, 8, 16, v, views)
                assert got.tolist() == ref[v], (n, v, got.tolist(), ref[v])
        # TSN eval
        ref = ref_test(n, 8, 0, 1)[0]
        assert sample_indices_tsn(n, 8, None).tolist() == ref, n

    def ref_random(n, clip, rate, rng):
        if rate <= 0:
            seg = (n - 1) / clip
            return [rng.randint(round(seg * i), round(seg * (i + 1)) + 1)
                    for i in range(clip)]
        if rate * (clip - 1) + 1 >= n:
            out = []
            for i in range(clip):
                out.append(i * rate if i * rate < n else out[-1])
            return out
        start = rng.randint(n - rate * (clip - 1))
        return list(range(start, start + rate * clip, rate))

    for n in (10, 50, 113, 128, 150, 300):
        a, b = np.random.RandomState(7), np.random.RandomState(7)
        for _ in range(20):
            got = sample_indices_random(n, 8, 16, a).tolist()
            assert got == ref_random(n, 8, 16, b), (n, got)
        a, b = np.random.RandomState(9), np.random.RandomState(9)
        for _ in range(20):
            got = sample_indices_tsn(n, 8, a).tolist()
            assert got == ref_random(n, 8, 0, b), (n, got)
    # train start is actually random when the video is long enough
    starts = {sample_indices_random(128, 8, 16, np.random.RandomState(s))[0]
              for s in range(50)}
    assert len(starts) > 5, starts


def test_ssv2_config_disables_mirror():
    """SSv2 labels are direction-sensitive; the reference trains it with
    mirror=False (video_datasets.py:56) while K400 mirrors (:25)."""
    import main_video

    p = main_video.get_args_parser()
    a = p.parse_args(["--dataset", "ssv2", "--data_path", "/x"])
    cfg = main_video.build_config(a)
    assert cfg.data.mirror is False
    assert cfg.data.train_resize_type == "random_resized_crop"
    a = p.parse_args(["--dataset", "k400", "--data_path", "/x"])
    cfg = main_video.build_config(a)
    assert cfg.data.mirror is True
    # reference K400 recipe: short-side jitter over [1.0, 1.15] x crop
    assert cfg.data.train_resize_type == "random_short_side_scale_jitter"
    assert (cfg.data.jitter_min, cfg.data.jitter_max) == (224, 258)


def test_tsn_eval_multi_segment_fails_loud(tmp_path):
    """The reference asserts temporal multi-crop is unsupported for TSN
    (rate<=0) sampling (k400.py:227-229); silent acceptance would emit
    bit-identical duplicate views."""
    lf = tmp_path / "list.txt"
    import pytest

    lf.write_text("a.mp4 0\n")
    from dynamic_tuning_tpu.data.video import VideoDataset
    with pytest.raises(ValueError, match="test_num_segment"):
        VideoDataset(str(tmp_path), str(lf), sampling_rate=0,
                     test_mode=True, test_num_segment=3)
    # rate>0 multi-view and TSN single-view stay constructible
    VideoDataset(str(tmp_path), str(lf), sampling_rate=16,
                 test_mode=True, test_num_segment=3)
    VideoDataset(str(tmp_path), str(lf), sampling_rate=0,
                 test_mode=True, test_num_segment=1)
