"""One-shot validation against the REAL released ViT-B/16-IN21K weights.

The whole reference recipe starts from timm's ``jx_vit_base_patch16_224_
in21k`` checkpoint (/root/reference/main_image.py:219-256).  Our import
path (qkv packing, OIHW->HWIO, head surgery, exact-torch-bicubic pos-embed
interpolation) is pinned at full shape on realistic-statistics RANDOM
state dicts; this script closes the last gap the day the real ``.pth``
lands (no egress in the build sandbox — see OPERATOR.md).

What it does, given the .pth:
  1. loads the checkpoint into the REFERENCE's own model code
     (models/vision_transformer_IN21K.py, executed unmodified via the
     test-only timm shim) at the checkpoint's native class count;
  2. imports the same .pth into our flax model via
     train/checkpoint.import_pretrained;
  3. runs both in ``complete_model=True`` eval (adapters are zero-init by
     the lora rule so fresh adapter/router params contribute nothing) on a
     shared batch of normalized inputs, and on real images if a directory
     is supplied;
  4. reports max |logit delta|, relative scale, argmax agreement, and the
     missing-keys set (must be exactly the adapter/router params, i.e. the
     reference's trainable set).

``--families video,seg`` additionally validates the OTHER two recipes'
import of the SAME image checkpoint:
  * video — reference video model ingests the raw .pth exactly as
    main_video.py does (strict=False, head surgery); the params a video
    run initializes fresh (adapters/routers/query token/attentive pool)
    are overlaid from OUR imported tree so both sides share them, then
    complete-model logits are compared on a 2-frame clip.
  * seg — reference seg backbone ingests the raw .pth through its own
    ``_prepare_pos_embed`` hook (torch-bicubic pos-embed resize to the
    ``--seg_img`` grid) vs our import path's interpolation; fresh params
    (rel-pos tables, adapters, routers, FPN) overlaid the same way; all
    four FPN feature taps compared.

Pass criteria (printed as JSON): rel_err <= 1e-3 per family, argmax
agreement = 1.0 (image/video), missing == adapters+routers only.

Run: python scripts/validate_real_ckpt.py --ckpt /ckpts/VIT_BASE_IN21K.pth
         [--images /path/to/dir] [--batch 8] [--tpu]
         [--families image,video,seg] [--seg_img 512]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--images", default=None,
                    help="optional dir of JPEG/PNG images for a real-pixel "
                         "logit comparison (decoded by our eval pipeline)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="run the JAX side on the default backend (TPU); "
                         "default forces CPU for an apples-to-apples fp32 "
                         "comparison")
    ap.add_argument("--families", default="image,video,seg",
                    help="comma list of recipes to validate the ckpt "
                         "import for (image, video, seg)")
    ap.add_argument("--seg_img", type=int, default=512,
                    help="seg crop size (512 = the reference recipe; the "
                         "224->grid pos-embed resize is exercised for any "
                         "value != 224)")
    args = ap.parse_args()
    families = args.families.split(",")

    import jax

    if not args.tpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:
            print(f"WARNING: could not force CPU platform ({e})",
                  file=sys.stderr)

    import jax.numpy as jnp
    import numpy as np
    import torch

    from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
    from dynamic_tuning_tpu.models.vit import VisionTransformer
    from dynamic_tuning_tpu.train.checkpoint import (import_pretrained,
                                                     load_torch_state_dict)

    sd = load_torch_state_dict(args.ckpt)
    classes = int(sd["head.weight"].shape[0]) if "head.weight" in sd else 0
    report = {"ckpt": args.ckpt, "classes": classes,
              "n_keys": len(sd)}

    # --- inputs: normalized random + optional real images ----------------
    rs = np.random.RandomState(0)
    x = np.clip(rs.randn(args.batch, 224, 224, 3), -2.6, 2.6
                ).astype(np.float32)
    if args.images:
        from dynamic_tuning_tpu.data.datasets import decode_canvas

        files = sorted(
            f for f in os.listdir(args.images)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))[:args.batch]
        # reference eval geometry: Resize short side to 256 (PIL bicubic)
        # then CenterCrop 224 — same 256-canvas chain predict.py deploys
        # (a direct short-side-224 resize would feed different pixels
        # than the reference recipe)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)

        def load224(f):
            cv = decode_canvas(os.path.join(args.images, f), 256)
            h, w = cv.shape[:2]
            y0, x0 = (h - 224) // 2, (w - 224) // 2
            crop = cv[y0:y0 + 224, x0:x0 + 224]
            return (crop.astype(np.float32) / 255.0 - mean) / std

        imgs = [load224(f) for f in files]
        if imgs:
            x = np.stack(imgs).astype(np.float32)
            report["real_images"] = len(imgs)

    # --- reference's own code with the real weights -----------------------
    from reference_oracle import (build_reference_image_model,
                                  reference_available)

    if not reference_available():
        print(json.dumps({**report, "error":
                          "/root/reference not present — reference-executed "
                          "side skipped"}))
        return 1
    ref = build_reference_image_model(classes=classes or 1000)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
           if not k.startswith("pre_logits.")}
    missing, unexpected = ref.load_state_dict(tsd, strict=False)
    trainable_only = all(("adaptmlp" in k or "mlp_token_select" in k)
                         for k in missing)
    report["torch_missing_ok"] = trainable_only
    report["torch_unexpected"] = list(unexpected)
    ref.eval()
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous(),
                      complete_model=True)
    want = want.numpy()

    # --- our import path + flax model -------------------------------------
    model = VisionTransformer(ModelConfig(num_classes=classes or 1000),
                              tuning=TuningConfig(), select=SelectConfig(),
                              dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
    params, miss = import_pretrained(params, sd)
    flax_missing_ok = all(("adaptmlp" in p or "mlp_token_select" in p)
                          for p in miss)
    report["flax_missing_ok"] = flax_missing_ok
    ours, _ = model.apply({"params": params}, jnp.asarray(x),
                          complete_model=True)
    ours = np.asarray(ours, np.float32)

    # --- verdict -----------------------------------------------------------
    scale = float(np.abs(want).max())
    max_abs = float(np.abs(ours - want).max())
    rel = max_abs / max(scale, 1e-9)
    agree = float((ours.argmax(-1) == want.argmax(-1)).mean())
    top5_ours = np.argsort(-ours, axis=-1)[:, :5]
    top5_want = np.argsort(-want, axis=-1)[:, :5]
    report.update({
        "logit_scale": round(scale, 3),
        "max_abs_delta": round(max_abs, 6),
        "rel_err": round(rel, 8),
        "argmax_agreement": agree,
        # SET overlap per row (positional == would punish harmless rank
        # swaps between near-tied classes)
        "top5_overlap": float(np.mean([
            len(set(a) & set(b)) / 5.0
            for a, b in zip(top5_ours, top5_want)])),
        "pass": bool(rel <= 1e-3 and agree == 1.0 and trainable_only
                     and flax_missing_ok and not unexpected),
    })

    from flax import traverse_util

    def _flat(p):
        return {k: np.asarray(v)
                for k, v in traverse_util.flatten_dict(p).items()}

    def _overlay_fresh(ref_model, raw_missing, full_sd):
        """Copy OUR values for exactly the keys the raw ckpt left fresh, so
        both frameworks share every parameter before comparing."""
        overlay = {k: full_sd[k] for k in raw_missing if k in full_sd}
        ref_model.load_state_dict(overlay, strict=False)
        return sorted(k for k in raw_missing if k not in full_sd)

    if "video" in families:
        from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer
        from reference_oracle import (build_reference_video_model,
                                      flax_to_video_sd)

        T = 2
        xv = np.stack([x, np.roll(x, 1, axis=0)], axis=1)  # [B,T,H,W,C]
        vmodel = VideoVisionTransformer(
            ModelConfig(num_classes=classes or 1000, num_frames=T),
            tuning=TuningConfig(), select=SelectConfig(), dtype=jnp.float32)
        vp = vmodel.init(jax.random.PRNGKey(0),
                         jnp.asarray(xv[:1]))["params"]
        vp, vmiss = import_pretrained(vp, sd)
        vref = build_reference_video_model(classes=classes or 1000)
        vmissing, vunexpected = vref.load_state_dict(tsd, strict=False)
        unmapped = _overlay_fresh(vref, vmissing,
                                  flax_to_video_sd(_flat(vp), depth=12))
        vref.eval()
        with torch.no_grad():
            vwant, _ = vref(torch.from_numpy(xv).permute(
                0, 4, 1, 2, 3).contiguous(), complete_model=True)
        vwant = vwant.numpy()
        vours, _ = vmodel.apply({"params": vp}, jnp.asarray(xv),
                                complete_model=True)
        vours = np.asarray(vours, np.float32)
        vscale = float(np.abs(vwant).max())
        vrel = float(np.abs(vours - vwant).max()) / max(vscale, 1e-9)
        vagree = float((vours.argmax(-1) == vwant.argmax(-1)).mean())
        report["video"] = {
            "rel_err": round(vrel, 8), "argmax_agreement": vagree,
            "unmapped_fresh_keys": unmapped,
            "torch_unexpected": [k for k in vunexpected],
            "pass": bool(vrel <= 1e-3 and vagree == 1.0 and not unmapped
                         and not vunexpected),
        }

    if "seg" in families:
        from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer
        from reference_oracle import (build_reference_seg_model,
                                      flax_to_seg_sd)

        SIMG = args.seg_img
        xs = np.clip(rs.randn(2, SIMG, SIMG, 3), -2.6, 2.6
                     ).astype(np.float32)
        smodel = SegVisionTransformer(
            ModelConfig(img_size=SIMG, num_classes=2), tuning=TuningConfig(),
            select=SelectConfig(), dtype=jnp.float32)
        sp = smodel.init(jax.random.PRNGKey(0),
                         jnp.asarray(xs[:1]))["params"]
        sp, smiss = import_pretrained(sp, sd)
        sref = build_reference_seg_model(img=SIMG)
        smissing, sunexpected = sref.load_state_dict(tsd, strict=False)
        # rel-pos index buffers are deterministic constants, never in a ckpt
        smissing = [k for k in smissing
                    if not k.endswith("relative_position_index")]
        unmapped = _overlay_fresh(sref, smissing,
                                  flax_to_seg_sd(_flat(sp), depth=12))
        # classification-only ckpt keys absent from the seg backbone
        sunexpected = [k for k in sunexpected
                       if k not in ("norm.weight", "norm.bias",
                                    "head.weight", "head.bias")]
        sref.eval()
        with torch.no_grad():
            swant_feats, _ = sref(torch.from_numpy(xs).permute(
                0, 3, 1, 2).contiguous())
        sfeats, _ = smodel.apply({"params": sp}, jnp.asarray(xs))
        srel = 0.0
        for f_ours, f_want in zip(sfeats, swant_feats):
            w = f_want.permute(0, 2, 3, 1).numpy()
            srel = max(srel, float(np.abs(np.asarray(f_ours) - w).max())
                       / max(float(np.abs(w).max()), 1e-9))
        report["seg"] = {
            "feat_rel_err": round(srel, 8),
            "unmapped_fresh_keys": unmapped,
            "torch_unexpected": [k for k in sunexpected],
            "pass": bool(srel <= 1e-3 and not unmapped and not sunexpected),
        }

    report["pass"] = bool(report["pass"]
                          and report.get("video", {}).get("pass", True)
                          and report.get("seg", {}).get("pass", True))
    print(json.dumps(report))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
