"""Seg-head / seg-loss / seg-metric parity against the reference's OWN
executed mmseg code.

The transcription tests (tests/test_segmentation.py's torch replica,
tests/torch_oracle.py) pin our UPerHead/FCNHead against a hand-written
torch mirror; these tests execute the LIVE files of the reference's
vendored mmseg fork instead, loaded unmodified by
:func:`reference_oracle.load_reference_mmseg` under the faithful-minimal
``tests/mmcv_shim``:

  * ``models/decode_heads/{uper_head,psp_head,fcn_head,decode_head}.py``:
    the heads the seg recipe builds (config our_vit.py <-
    _base_/models/upernet_beit.py: BN norm, pool_scales (1,2,3,6), aux
    FCNHead num_convs=1/concat_input=False), built THROUGH the executed
    ``HEADS`` registry + builder, forward-compared against our flax
    UPerHead/FCNHead (norm='bn') with identical injected params incl. BN
    running stats.
  * ``models/losses/cross_entropy_loss.py`` (+ utils.weight_reduce_loss)
    via ``BaseDecodeHead.losses``: CE normalization — this EXECUTED test
    is what caught that the reference averages over ALL pixels (ignored
    255s count in the denominator), fixed in models/upernet.py::seg_loss.
  * ``core/evaluation/metrics.py``: intersect_and_union / eval_metrics
    (incl. the reduce_zero_label branch) vs our
    confusion_matrix/miou_from_confusion and the ADE20K label reduction.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.models import upernet as UN
from dynamic_tuning_tpu.utils.metrics import (confusion_matrix,
                                              miou_from_confusion)

from reference_oracle import load_reference_mmseg, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

NORM_BN = dict(type="BN", requires_grad=True)
CE_CFG = dict(type="CrossEntropyLoss", use_sigmoid=False, loss_weight=1.0)


def _t(tree, *path):
    v = tree
    for k in path:
        v = v[k]
    return torch.from_numpy(np.asarray(v, np.float32))


def _inject_conv_module(ref_cm, params, stats, *path):
    """Copy one flax ConvModule (conv/kernel HWIO + bn params/stats) into
    an executed mmcv ConvModule (conv.weight OIHW, bn.*)."""
    with torch.no_grad():
        ref_cm.conv.weight.copy_(
            _t(params, *path, "conv", "kernel").permute(3, 2, 0, 1))
        ref_cm.bn.weight.copy_(_t(params, *path, "bn", "scale"))
        ref_cm.bn.bias.copy_(_t(params, *path, "bn", "bias"))
        ref_cm.bn.running_mean.copy_(_t(stats, *path, "bn", "mean"))
        ref_cm.bn.running_var.copy_(_t(stats, *path, "bn", "var"))


def _perturbed_init(module, feats_or_x, seed=0):
    """init + non-trivial params AND BN running stats (mean shifted, var
    scaled off 1) so norm semantics are actually exercised."""
    variables = module.init(jax.random.PRNGKey(seed), feats_or_x)
    params, stats = variables["params"], variables["batch_stats"]
    rs = np.random.RandomState(seed + 1)

    def _p(v):
        return v + 0.05 * rs.randn(*v.shape).astype(np.float32)

    def _s(path, v):
        if path[-1].key == "var":
            return v * (0.5 + rs.rand(*v.shape).astype(np.float32))
        return v + 0.2 * rs.randn(*v.shape).astype(np.float32)

    params = jax.tree_util.tree_map(_p, params)
    stats = jax.tree_util.tree_map_with_path(_s, stats)
    return params, stats


def _build_ref_uper(nc, channels, in_channels):
    m = load_reference_mmseg()
    head = m["builder"].HEADS.build(dict(
        type="UPerHead", in_channels=list(in_channels), in_index=[0, 1, 2, 3],
        pool_scales=(1, 2, 3, 6), channels=channels, dropout_ratio=0.1,
        num_classes=nc, norm_cfg=NORM_BN, align_corners=False,
        loss_decode=dict(CE_CFG)))
    head.eval()
    return head


def _inject_uper(ref, params, stats):
    for i in range(4):
        _inject_conv_module(ref.psp_modules[i][1], params, stats,
                            "psp", f"pool_{i}")
    _inject_conv_module(ref.bottleneck, params, stats, "psp", "bottleneck")
    for i in range(3):
        _inject_conv_module(ref.lateral_convs[i], params, stats,
                            f"lateral_{i}")
        _inject_conv_module(ref.fpn_convs[i], params, stats, f"fpn_{i}")
    _inject_conv_module(ref.fpn_bottleneck, params, stats, "fpn_bottleneck")
    with torch.no_grad():
        ref.conv_seg.weight.copy_(
            _t(params, "conv_seg", "kernel").permute(3, 2, 0, 1))
        ref.conv_seg.bias.copy_(_t(params, "conv_seg", "bias"))


@pytest.mark.parametrize("sizes,C,NC,tol", [
    ((64, 32, 16, 8), 64, 7, 3e-5),
    # degenerate PSP regime: last-stage feature 2x2 < pool scales 3 and 6,
    # so adaptive pool goes UP (output > input) and the PSP branch then
    # bilinearly DOWNSCALES back — exercises _resize's exact torch 2-tap
    # downscale path (jax.image.resize antialiases there; the round-4 red
    # test's root cause).  Unreachable at the ADE20K recipe (512^2 ->
    # smallest PSP input 16x16) but a genuine head regime.
    ((16, 8, 4, 2), 16, 7, 3e-5),
])
def test_uperhead_matches_executed_mmseg(sizes, C, NC, tol):
    """Our flax UPerHead (norm='bn') vs the reference's EXECUTED mmseg
    UPerHead, same params + BN running stats — covering both the all-
    upsample geometry of the live recipe and the pool-scale > input
    downscale regime."""
    head = UN.UPerHead(NC, channels=C, norm="bn", dtype=jnp.float32)
    rs = np.random.RandomState(3)
    feats = [jnp.asarray(rs.randn(2, s, s, C).astype(np.float32))
             for s in sizes]
    params, stats = _perturbed_init(head, feats)
    got = np.asarray(head.apply({"params": params, "batch_stats": stats},
                                feats))

    ref = _build_ref_uper(NC, C, [C] * 4)
    _inject_uper(ref, params, stats)
    with torch.no_grad():
        out = ref([torch.from_numpy(np.asarray(f)).permute(0, 3, 1, 2)
                   for f in feats])
    ref_np = out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref_np, rtol=tol, atol=tol)


@pytest.mark.fullscale
def test_uperhead_matches_executed_mmseg_full_scale():
    """Full operating point of the seg recipe (our_vit.py): channels 768,
    150 classes, stride-4/8/16/32 geometry of the 512^2 crop.  Tolerance
    1e-3 abs: at the 3x3 3072->768 fpn_bottleneck contraction float32
    accumulation order (torch vs XLA) leaves ~6e-4 worst-case on O(10)
    logits (0.005% of elements above 3e-4); the C=64 case above pins the
    same semantics at 3e-5."""
    test_uperhead_matches_executed_mmseg((128, 64, 32, 16), 768, 150, 1e-3)


def test_fcnhead_matches_executed_mmseg():
    """Aux head: FCNHead num_convs=1, concat_input=False, in_index=2
    (upernet_beit.py auxiliary_head) vs our FCNHead (norm='bn')."""
    m = load_reference_mmseg()
    C, CH, NC = 64, 32, 7
    our = UN.FCNHead(NC, channels=CH, norm="bn", dtype=jnp.float32)
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 16, 16, C).astype(np.float32))
    params, stats = _perturbed_init(our, x)
    got = np.asarray(our.apply({"params": params, "batch_stats": stats}, x))

    ref = m["builder"].HEADS.build(dict(
        type="FCNHead", in_channels=C, in_index=2, channels=CH, num_convs=1,
        concat_input=False, dropout_ratio=0.1, num_classes=NC,
        norm_cfg=NORM_BN, align_corners=False,
        loss_decode=dict(CE_CFG, loss_weight=0.4)))
    ref.eval()
    _inject_conv_module(ref.convs[0], params, stats, "conv0")
    with torch.no_grad():
        ref.conv_seg.weight.copy_(
            _t(params, "conv_seg", "kernel").permute(3, 2, 0, 1))
        ref.conv_seg.bias.copy_(_t(params, "conv_seg", "bias"))
        out = ref.forward([None, None,
                           torch.from_numpy(np.asarray(x))
                           .permute(0, 3, 1, 2), None])
    np.testing.assert_allclose(got, out.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- losses


def _random_logits_labels(rs, B=2, NC=7, H=32, W=32, ignore_band=6):
    logits = rs.randn(B, NC, H, W).astype(np.float32)
    labels = rs.randint(0, NC, (B, H, W)).astype(np.int64)
    labels[:, :ignore_band] = 255
    return logits, labels


def test_ce_normalization_matches_executed_mmseg():
    """BaseDecodeHead.losses executed (same-size logits -> the internal
    resize is identity): the CE mean is over ALL pixels — ignored 255s
    count in the denominator (cross_entropy_loss.py:20-32 +
    utils.py:66-68).  Our seg_loss must reproduce it exactly; this test
    FAILED against the old valid-count denominator."""
    m = load_reference_mmseg()
    rs = np.random.RandomState(11)
    logits, labels = _random_logits_labels(rs)

    ref_head = _build_ref_uper(7, 16, [16] * 4)
    ref_loss = ref_head.losses(torch.from_numpy(logits),
                               torch.from_numpy(labels[:, None]))

    zero = jnp.zeros(())
    nhwc = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
    total, parts = UN.seg_loss(nhwc, nhwc, jnp.asarray(labels), zero)
    np.testing.assert_allclose(float(parts["decode_loss"]),
                               float(ref_loss["loss_ce"]), rtol=1e-6)
    # all-ignored batch: the reference yields 0 (0-sum / N_total)
    all_ign = np.full_like(labels, 255)
    ref0 = ref_head.losses(torch.from_numpy(logits),
                           torch.from_numpy(all_ign[:, None]))
    t0, _ = UN.seg_loss(nhwc, nhwc, jnp.asarray(all_ign), zero)
    assert float(ref0["loss_ce"]) == float(t0) == 0.0


def test_composite_loss_matches_executed_mmseg():
    """decode CE*1.0 + aux CE*0.4 (the two heads' loss_weight in
    upernet_beit.py) vs our seg_loss total (token term zeroed), with the
    reference's logit->label bilinear resize executed (logits at stride 4
    like the live path, labels at crop size)."""
    m = load_reference_mmseg()
    rs = np.random.RandomState(13)
    B, NC, H = 2, 7, 64
    logits = rs.randn(B, NC, H // 4, H // 4).astype(np.float32)
    aux_logits = rs.randn(B, NC, H // 4, H // 4).astype(np.float32)
    labels = rs.randint(0, NC, (B, H, H)).astype(np.int64)
    labels[:, :9] = 255

    dec = _build_ref_uper(NC, 16, [16] * 4)
    aux = m["builder"].HEADS.build(dict(
        type="FCNHead", in_channels=16, in_index=2, channels=16,
        num_convs=1, concat_input=False, dropout_ratio=0.1, num_classes=NC,
        norm_cfg=NORM_BN, align_corners=False,
        loss_decode=dict(CE_CFG, loss_weight=0.4)))
    lab_t = torch.from_numpy(labels[:, None])
    ref_total = (dec.losses(torch.from_numpy(logits), lab_t)["loss_ce"]
                 + aux.losses(torch.from_numpy(aux_logits), lab_t)["loss_ce"])

    # ours: the segmentor resizes logits to input size before seg_loss
    up = UN._resize(jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), (H, H))
    up_aux = UN._resize(jnp.asarray(np.transpose(aux_logits, (0, 2, 3, 1))),
                        (H, H))
    total, _ = UN.seg_loss(up, up_aux, jnp.asarray(labels), jnp.zeros(()))
    np.testing.assert_allclose(float(total), float(ref_total),
                               rtol=2e-6, atol=2e-6)


# ------------------------------------------------------------- metrics


def test_eval_metrics_match_executed_mmseg():
    """core/evaluation/metrics.py eval_metrics executed vs our
    confusion-matrix mIoU/aAcc, multi-image accumulation, with untouched
    classes (NaN IoU -> nanmean) and 255 ignores."""
    m = load_reference_mmseg()
    rs = np.random.RandomState(17)
    NC = 9
    preds, gts = [], []
    for _ in range(4):
        pred = rs.randint(0, NC - 2, (40, 40))  # classes 7,8 never predicted
        gt = rs.randint(0, NC - 2, (40, 40))
        gt[:5] = 255
        preds.append(pred)
        gts.append(gt)

    ref = m["metrics"].eval_metrics(preds, gts, NC, ignore_index=255)

    cm = np.zeros((NC, NC), np.int64)
    for p, g in zip(preds, gts):
        cm += confusion_matrix(p, g, NC)
    miou, iou = miou_from_confusion(cm)
    ref_iou = np.asarray(ref["IoU"], np.float64) * 100.0
    np.testing.assert_allclose(iou, ref_iou, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(miou, np.nanmean(ref_iou), rtol=1e-6)
    aacc = np.diag(cm).sum() / cm.sum()
    np.testing.assert_allclose(aacc, float(ref["aAcc"]), rtol=1e-6)


def _stub_logits_torch(img, nc):
    """Deterministic crop->logits map, exactly replicable in jax: channel c
    is the RGB mean rolled by c rows plus a class bias."""
    base = img.mean(1)
    return torch.stack([torch.roll(base, c, dims=1) + 0.1 * c
                        for c in range(nc)], dim=1)


def _stub_logits_jax(_params, tiles, nc):
    base = tiles.mean(-1)
    return jnp.stack([jnp.roll(base, c, axis=1) + 0.1 * c
                      for c in range(nc)], axis=-1)


@pytest.mark.parametrize("H,W,crop,stride", [
    (130, 100, 50, 30),
    (50, 50, 50, 30),       # single window
    (60, 60, 50, 30),       # clamped second window (starts {0, 10})
    (128, 96, 64, 41),      # the live 512/341 ratio scaled down
])
@pytest.mark.parametrize("tile_batch", [1, 3])
def test_slide_inference_matches_executed_mmseg(H, W, crop, stride,
                                                tile_batch):
    """EncoderDecoder.slide_inference executed (the real grid walk, window
    clamping, F.pad accumulation and count_mat averaging,
    encoder_decoder.py:156-199) vs our slide_inference, both driven by the
    same deterministic crop->logits stub.  Covers duplicate/clamped
    windows (where averaging weights would expose any grid mismatch) and
    our tile_batch>1 mode (must stay identical to the one-at-a-time
    protocol).  Images >= crop only: for smaller images the reference
    feeds the raw small patch while our static-shape pipeline pads to the
    crop — a documented structural difference, not a live-eval case
    (ADE20K eval resizes the short side to the crop size)."""
    m = load_reference_mmseg()
    NC = 5
    rs = np.random.RandomState(H + W)
    img = rs.randn(H, W, 3).astype(np.float32)

    ed = object.__new__(m["encdec"].EncoderDecoder)
    ed.test_cfg = type("cfg", (), {"stride": (stride, stride),
                                   "crop_size": (crop, crop)})()
    ed.num_classes = NC
    ed.align_corners = False
    ed.encode_decode = lambda im, meta: (_stub_logits_torch(im, NC), None)
    img_t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref, _ = m["encdec"].EncoderDecoder.slide_inference(
        ed, img_t, [dict(ori_shape=(H, W, 3))], rescale=False)
    ref_np = ref[0].permute(1, 2, 0).numpy()

    got = UN.slide_inference(
        lambda p, t: _stub_logits_jax(p, t, NC), None, jnp.asarray(img),
        num_classes=NC, crop=crop, stride=stride, tile_batch=tile_batch)
    np.testing.assert_allclose(np.asarray(got), ref_np, rtol=1e-5,
                               atol=1e-6)


def test_forward_train_composition_matches_executed_mmseg():
    """The WHOLE executed train-loss chain — EncoderDecoder.forward_train
    (token_loss wiring, encoder_decoder.py:139-155) -> heads'
    forward_train -> losses() (internal logit->label resize) ->
    add_prefix -> BaseSegmentor._parse_losses (sums every key containing
    'loss', base.py:166-189) — vs our seg_loss composition
    main + 0.4*aux + token on the same features/params."""
    m = load_reference_mmseg()
    NC, C, IMG = 7, 16, 64
    rs = np.random.RandomState(23)
    feats_np = [rs.randn(2, s, s, C).astype(np.float32)
                for s in (16, 8, 4, 2)]
    token_loss = 0.37

    class _TestBackbone(torch.nn.Module):
        def __init__(self):
            super().__init__()

        def forward(self, img):
            fs = [torch.from_numpy(f).permute(0, 3, 1, 2)
                  for f in feats_np]
            return fs, dict(loss=torch.tensor(token_loss))

    if m["builder"].BACKBONES.get("_TestBackbone") is None:
        m["builder"].BACKBONES.register_module(module=_TestBackbone)

    ed = m["encdec"].EncoderDecoder(
        backbone=dict(type="_TestBackbone"),
        decode_head=dict(
            type="UPerHead", in_channels=[C] * 4, in_index=[0, 1, 2, 3],
            pool_scales=(1, 2, 3, 6), channels=C, dropout_ratio=0.1,
            num_classes=NC, norm_cfg=NORM_BN, align_corners=False,
            loss_decode=dict(CE_CFG)),
        auxiliary_head=dict(
            type="FCNHead", in_channels=C, in_index=2, channels=C,
            num_convs=1, concat_input=False, dropout_ratio=0.1,
            num_classes=NC, norm_cfg=NORM_BN, align_corners=False,
            loss_decode=dict(CE_CFG, loss_weight=0.4)),
        train_cfg=dict(), test_cfg=dict(mode="whole"))
    ed.eval()  # deterministic: dropout off, BN on injected running stats

    # shared params: init our heads, inject into the executed ones
    uper = UN.UPerHead(NC, channels=C, norm="bn", dtype=jnp.float32)
    feats_j = [jnp.asarray(f) for f in feats_np]
    p_u, s_u = _perturbed_init(uper, feats_j, seed=31)
    _inject_uper(ed.decode_head, p_u, s_u)
    fcn = UN.FCNHead(NC, channels=C, norm="bn", dtype=jnp.float32)
    p_f, s_f = _perturbed_init(fcn, feats_j[2], seed=37)
    _inject_conv_module(ed.auxiliary_head.convs[0], p_f, s_f, "conv0")
    with torch.no_grad():
        ed.auxiliary_head.conv_seg.weight.copy_(
            _t(p_f, "conv_seg", "kernel").permute(3, 2, 0, 1))
        ed.auxiliary_head.conv_seg.bias.copy_(_t(p_f, "conv_seg", "bias"))

    labels = rs.randint(0, NC, (2, IMG, IMG)).astype(np.int64)
    labels[:, :11] = 255
    img_t = torch.zeros(2, 3, IMG, IMG)
    with torch.no_grad():
        losses = ed.forward_train(img_t, [dict()],
                                  torch.from_numpy(labels[:, None]))
    ref_total, logv = m["base"].BaseSegmentor._parse_losses(losses)
    assert set(k for k in logv if "loss" in k) == {
        "token_loss", "decode.loss_ce", "aux.loss_ce", "loss"}

    # ours: heads' logits resized to label size (as DyTSegmentor does),
    # then seg_loss
    lg = uper.apply({"params": p_u, "batch_stats": s_u}, feats_j)
    ax = fcn.apply({"params": p_f, "batch_stats": s_f}, feats_j[2])
    total, _ = UN.seg_loss(UN._resize(lg, (IMG, IMG)),
                           UN._resize(ax, (IMG, IMG)),
                           jnp.asarray(labels), jnp.asarray(token_loss))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)


def test_reduce_zero_label_matches_executed_mmseg():
    """The ADE20K label convention: intersect_and_union's
    reduce_zero_label branch executed (label-1; 0 -> 255) vs our loader's
    reduction (data/segmentation.py)."""
    m = load_reference_mmseg()
    rs = np.random.RandomState(19)
    NC = 6
    raw = rs.randint(0, NC + 1, (32, 32))  # 0 = mmseg 'background' drop
    pred = rs.randint(0, NC, (32, 32))

    # NB: the executed intersect_and_union REDUCES THE LABEL IN PLACE
    # (metrics.py's reduce_zero_label branch writes into the caller's
    # array) — hand it a copy so the comparison below sees raw labels
    i_ref, u_ref, _, _ = m["metrics"].intersect_and_union(
        pred, raw.copy(), NC, ignore_index=255, label_map=dict(),
        reduce_zero_label=True)

    # our loader-side reduction, then the plain confusion path
    red = raw.astype(np.int64) - 1
    red[raw == 0] = 255
    cm = confusion_matrix(pred, red, NC)
    inter = np.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    np.testing.assert_array_equal(inter, i_ref.numpy().astype(np.int64))
    np.testing.assert_array_equal(union, u_ref.numpy().astype(np.int64))
