"""UperNet decode head + FCN auxiliary head + DyT segmentor.

Re-implements natively what the reference vendors from mmsegmentation
(~23.5k LoC fork under dense_tasks/Segmentation/mmseg): UPerHead (PSP pyramid
pooling + FPN top-down fusion), FCNHead aux (weight 0.4), and the
encoder-decoder segmentor whose total loss also carries the backbone's token
budget loss (reference mmseg/models/segmentors/encoder_decoder.py:139-142 —
``losses['token_loss']`` summed by ``_parse_losses``).

TPU-native deviation: ConvModules use GroupNorm instead of SyncBN — no
cross-device batch-stat state, no extra collective; everything stays a pure
param pytree under one jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer

Dtype = Any


def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] matrix of torch ``F.interpolate(mode='bilinear',
    align_corners=False, antialias=False)`` along one axis: half-pixel
    source coords, 2 taps, edge-clamped.  Needed because
    ``jax.image.resize`` ANTIALIASES when downscaling (wider triangle
    kernel) while torch does not — the two agree only for scale >= 1."""
    m = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        w1 = x - x0
        i0 = min(max(x0, 0), n_in - 1)
        i1 = min(max(x0 + 1, 0), n_in - 1)
        m[i, i0] += 1.0 - w1
        m[i, i1] += w1
    return m


def _resize(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """torch ``F.interpolate(..., mode='bilinear', align_corners=False)``
    equivalent for NHWC (the resize the reference's mmseg fork uses
    everywhere, mmseg/ops/wrappers.py).  Upscaling uses jax.image.resize
    (identical kernel when scale >= 1, pinned at 1e-5 by
    tests/test_reference_seg_executed.py); any downscaled axis switches to
    an exact 2-tap matrix contraction because jax's bilinear antialiases
    on downscale and torch's does not (the UPerHead PSP pool-scale > input
    regime: adaptive pool UP to scale s then bilinear DOWN to the feature
    size)."""
    H, W = x.shape[1], x.shape[2]
    h, w = hw
    if h >= H and w >= W:
        return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]),
                                method="bilinear")
    mh = jnp.asarray(_bilinear_matrix(H, h), x.dtype)
    mw = jnp.asarray(_bilinear_matrix(W, w), x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, out)


class _ConvKernel(nn.Module):
    """Raw conv kernel param with nn.Conv's tree name and init (for the
    int8 path, which needs the unquantized weights)."""

    kh: int
    kw: int
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.kh, self.kw, self.in_ch, self.out_ch),
                          jnp.float32)


class ConvModule(nn.Module):
    out_ch: int
    kernel: int = 3
    norm: str = "gn"       # "gn" (stateless) | "bn" (SyncBN-parity)
    quant: str = "none"    # "int8": s8xs8 MXU convs on the serving path
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        if self.quant in ("int8", "int8_attn") and not training:
            # serving int8 conv (~2x MXU rate, measured 257 vs 128 TFLOPS at
            # the UPerHead bottleneck shape; shared s8xs8 conv with
            # per-channel weight x per-sample activation scales,
            # ops/quant.py::q8_conv)
            from dynamic_tuning_tpu.ops.quant import q8_conv

            w = _ConvKernel(self.kernel, self.kernel, x.shape[-1],
                            self.out_ch, name="conv")()
            x = q8_conv(x, w, strides=(1, 1), padding="SAME")
        else:
            x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name="conv")(x)
        if self.norm == "bn":
            # Under jit with a data-sharded batch, batch statistics reduce
            # over the GLOBAL batch — exactly the reference's SyncBN
            # (tools/seg_train.py:113) with zero extra collectives code.
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn")(
                                 x.astype(jnp.float32))
        else:
            x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="gn")(
                x.astype(jnp.float32))
        return nn.relu(x)


class PSPModule(nn.Module):
    """Pyramid pooling over the stride-32 feature (UPerHead's PSP part)."""

    channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "gn"
    quant: str = "none"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            pooled = _adaptive_avg_pool(x, s)
            pooled = ConvModule(self.channels, 1, norm=self.norm,
                                quant=self.quant, dtype=self.dtype,
                                name=f"pool_{i}")(pooled, training=training)
            outs.append(_resize(pooled, (h, w)))
        cat = jnp.concatenate(outs, axis=-1)
        return ConvModule(self.channels, 3, norm=self.norm, quant=self.quant,
                          dtype=self.dtype,
                          name="bottleneck")(cat, training=training)


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-stochastic matrix realizing torch AdaptiveAvgPool1d
    windows: output i averages input [floor(i*n/o), ceil((i+1)*n/o))."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -((-(i + 1) * n_in) // n_out)
        m[i, s:e] = 1.0 / (e - s)
    return m


def _adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch AdaptiveAvgPool2d equivalent for NHWC (exact window semantics).

    Divisible dims reduce by reshape-mean; non-divisible dims (the common
    PSP case: 16x16 feature, pool scales 3 and 6) contract against a
    precomputed variable-window averaging matrix — identical values to
    torch's variable-window means, and a static matmul instead of a gather.
    """
    B, H, W, C = x.shape
    if H % out == 0 and W % out == 0:
        return x.reshape(B, out, H // out, out, W // out, C).mean(axis=(2, 4))
    mh = jnp.asarray(_adaptive_pool_matrix(H, out), x.dtype)
    mw = jnp.asarray(_adaptive_pool_matrix(W, out), x.dtype)
    pooled = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, pooled)


class UPerHead(nn.Module):
    """UPerNet decode head (mmseg UPerHead semantics)."""

    num_classes: int
    channels: int = 768
    dropout: float = 0.1
    norm: str = "gn"
    quant: str = "none"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], *,
                 training: bool = False) -> jax.Array:
        psp_out = PSPModule(self.channels, norm=self.norm, quant=self.quant,
                            dtype=self.dtype,
                            name="psp")(feats[-1], training=training)
        laterals = [ConvModule(self.channels, 1, norm=self.norm,
                               quant=self.quant, dtype=self.dtype,
                               name=f"lateral_{i}")(f, training=training)
                    for i, f in enumerate(feats[:-1])]
        laterals.append(psp_out)

        for i in range(len(laterals) - 1, 0, -1):
            hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], hw)

        outs = [ConvModule(self.channels, 3, norm=self.norm,
                           quant=self.quant, dtype=self.dtype,
                           name=f"fpn_{i}")(laterals[i], training=training)
                for i in range(len(laterals) - 1)]
        outs.append(laterals[-1])
        hw0 = outs[0].shape[1:3]
        outs = [_resize(o, hw0) for o in outs]
        fused = ConvModule(self.channels, 3, norm=self.norm,
                           quant=self.quant, dtype=self.dtype,
                           name="fpn_bottleneck")(jnp.concatenate(outs, -1),
                                                  training=training)
        fused = nn.Dropout(self.dropout)(fused, deterministic=not training)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(fused.astype(jnp.float32))


class FCNHead(nn.Module):
    """1-conv FCN auxiliary head (mmseg FCNHead, loss weight 0.4)."""

    num_classes: int
    channels: int = 256
    dropout: float = 0.1
    norm: str = "gn"
    quant: str = "none"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        x = ConvModule(self.channels, 3, norm=self.norm, quant=self.quant,
                       dtype=self.dtype,
                       name="conv0")(x, training=training)
        x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="conv_seg")(x.astype(jnp.float32))


class DyTSegmentor(nn.Module):
    """Backbone + UPerHead + aux FCN (reference our_vit.py model config:
    in/channels 768, aux on feature index 2, ADE20K num_classes=150)."""

    cfg: ModelConfig
    num_classes: int = 150
    tuning: TuningConfig = TuningConfig()
    select: SelectConfig = SelectConfig()
    aux_index: int = 2
    out_indices: Optional[Tuple[int, ...]] = None
    use_rel_pos_bias: bool = True
    norm: str = "gn"   # "bn" = SyncBN parity (global batch stats under jit)
    # Opt-in DEVIATION from the reference head config (our_vit.py uses
    # channels=768): a narrower UPerHead working width.  The head is
    # flop-bound (BENCH.md: the 3x3 3072->768 fpn_bottleneck alone is
    # 21.7 ms/crop) and head flops scale ~C^2, so 256 cuts head cost ~9x.
    # None = reference parity (embed_dim).
    head_channels: Optional[int] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False,
                 complete_model: bool = False, dispatch: bool = False
                 ) -> Tuple[jax.Array, jax.Array, Dict]:
        feats, aux = SegVisionTransformer(
            self.cfg, tuning=self.tuning, select=self.select,
            out_indices=self.out_indices,   # None -> derived in the backbone
            use_rel_pos_bias=self.use_rel_pos_bias, dtype=self.dtype,
            name="backbone")(x, training=training,
                             complete_model=complete_model, dispatch=dispatch)
        logits = UPerHead(self.num_classes,
                          channels=self.head_channels or self.cfg.embed_dim,
                          norm=self.norm, quant=self.cfg.quant,
                          dtype=self.dtype,
                          name="decode_head")(feats, training=training)
        aux_logits = FCNHead(self.num_classes, norm=self.norm,
                             quant=self.cfg.quant, dtype=self.dtype,
                             name="auxiliary_head")(
                                 feats[self.aux_index], training=training)
        hw = (x.shape[1], x.shape[2])
        return _resize(logits, hw), _resize(aux_logits, hw), aux


def seg_loss(logits: jax.Array, aux_logits: jax.Array, labels: jax.Array,
             token_loss: jax.Array, aux_weight: float = 0.4,
             ignore_index: int = 255) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CE(main) + 0.4*CE(aux) + token budget loss (the reference sums every
    'loss' key, mmseg/models/segmentors/base.py _parse_losses).

    Normalization is the reference's EXECUTED semantics
    (mmseg/models/losses/cross_entropy_loss.py:20-32 with avg_factor=None
    -> utils.py:47-68 reduce_loss 'mean'): ignored pixels contribute 0 to
    the numerator but STILL COUNT in the denominator — the mean is over
    ALL pixels, not the valid ones.  (Caught by
    tests/test_reference_seg_executed.py; dividing by valid.sum() inflates
    the seg loss/gradients by 1/valid_fraction on ADE20K's 255 borders.)"""

    def ce(lg):
        lg = lg.astype(jnp.float32)
        valid = labels != ignore_index
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (nll * valid).sum() / labels.size

    main = ce(logits)
    aux = ce(aux_logits)
    total = main + aux_weight * aux + token_loss
    return total, dict(decode_loss=main, aux_loss=aux, token_loss=token_loss)


def slide_inference(apply_fn, params, image: jax.Array, *, num_classes: int,
                    crop: int = 512, stride: int = 341,
                    tile_batch: int = 1) -> jax.Array:
    """Sliding-window whole-image inference (reference
    encoder_decoder.py:180-199; test_cfg crop 512 / stride 341).

    image: [H, W, 3] normalized.  Returns [H, W, num_classes] logits.

    ``tile_batch`` > 1 runs that many window tiles per forward.  This is
    purely a launch-count lever: it wins only when per-dispatch latency
    dominates (a remote/tunneled device at ~25-50 ms RTT: 1.7-2.3x), and
    LOSES ~17%/tile in the compute-bound regime — batched 512^2 tiles
    schedule worse than back-to-back batch-1 forwards (BENCH.md round 5,
    scripts/bench_seg_compound.py).  Default 1 = the reference's
    one-at-a-time cadence.  The tile list pads to a multiple by repeating
    the last window with accumulation weight 0, so results are identical
    to the reference semantics; the model compiles once per
    (crop, tile_batch).
    """
    H, W = image.shape[0], image.shape[1]
    pad_h, pad_w = max(crop - H, 0), max(crop - W, 0)
    img = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w

    logits = jnp.zeros((Hp, Wp, num_classes), jnp.float32)
    count = jnp.zeros((Hp, Wp, 1), jnp.float32)
    ys = list(range(0, max(Hp - crop, 0) + 1, stride))
    xs = list(range(0, max(Wp - crop, 0) + 1, stride))
    if ys[-1] + crop < Hp:
        ys.append(Hp - crop)
    if xs[-1] + crop < Wp:
        xs.append(Wp - crop)
    coords = [(y, x0) for y in ys for x0 in xs]
    # Clamp to the real tile count: padding a 1-window image (512^2 at
    # crop 512) up to tile_batch=4 quadruples its compute for nothing —
    # measured 0.39x on TPU (scripts/bench_seg_tile_batch.py).
    tb = max(1, min(int(tile_batch), len(coords)))
    weights = [1.0] * len(coords)
    while len(coords) % tb:
        coords.append(coords[-1])
        weights.append(0.0)

    def accumulate(lg, cnt, out, y, x0, wgt):
        lg = jax.lax.dynamic_update_slice(
            lg, jax.lax.dynamic_slice(
                lg, (y, x0, 0), (crop, crop, num_classes)) + out * wgt,
            (y, x0, 0))
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(cnt, (y, x0, 0),
                                       (crop, crop, 1)) + wgt,
            (y, x0, 0))
        return lg, cnt

    for c0 in range(0, len(coords), tb):
        chunk = coords[c0:c0 + tb]
        tiles = jnp.stack([jax.lax.dynamic_slice(img, (y, x0, 0),
                                                 (crop, crop, 3))
                           for y, x0 in chunk])
        outs = apply_fn(params, tiles)
        for j, (y, x0) in enumerate(chunk):
            logits, count = accumulate(logits, count, outs[j], y, x0,
                                       weights[c0 + j])
    return (logits / jnp.maximum(count, 1.0))[:H, :W]
