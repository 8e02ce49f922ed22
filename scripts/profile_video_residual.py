"""Video serving residual line-item (post residual-dtype fix).

The video family serves at ~1.28-1.30x dispatch-vs-dense while the image
family reaches 1.34x; dense video itself runs ~9% slower per frame-image
than the image model (BENCH.md round 4).  Both gaps should be explained by
the routing-independent extras — tubelet/patch stem over B*T frames,
per-clip attentive pooling over T*N tokens, fold/unfold reshapes — or they
are a lever.  This measures each piece standalone (bench_util.device_time,
RTT-free) against the full model, mirroring profile_serving_residual.py.

Run (TPU): python scripts/profile_video_residual.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench_util import device_time
from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig

VB, T = 16, 8


def main():
    from dynamic_tuning_tpu.models.video_vit import VideoVisionTransformer
    from dynamic_tuning_tpu.models.vit import VisionTransformer

    out = {}
    cfg = ModelConfig(num_classes=400, num_frames=T, gelu_approx=True,
                      residual_dtype="bfloat16")
    sel = SelectConfig(token_target_ratio=0.5)
    vdyt = VideoVisionTransformer(cfg, tuning=TuningConfig(), select=sel,
                                  dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (VB, T, 224, 224, 3),
                          jnp.float32)
    params = vdyt.init(jax.random.PRNGKey(1), x[:1])["params"]

    def full(xx, p):
        logits, _ = vdyt.apply({"params": p}, xx, dispatch=True)
        return logits.sum()

    dt = device_time(full, x, params, i1=5, i2=25)
    out["video_full_ms"] = round(dt * 1e3, 3)
    out["video_clips_s"] = round(VB / dt, 1)

    # image model on the SAME B*T=128 frame stream (the blocks' workload)
    icfg = ModelConfig(num_classes=400, gelu_approx=True,
                       residual_dtype="bfloat16")
    im = VisionTransformer(icfg, tuning=TuningConfig(), select=sel,
                           dtype=jnp.bfloat16)
    xi = x.reshape(VB * T, 224, 224, 3)
    ip = im.init(jax.random.PRNGKey(1), xi[:2])["params"]

    def image_full(xx, p):
        logits, _ = im.apply({"params": p}, xx, dispatch=True)
        return logits.sum()

    dti = device_time(image_full, xi, ip, i1=5, i2=25)
    out["image_b128_ms"] = round(dti * 1e3, 3)
    out["video_minus_image_ms"] = round((dt - dti) * 1e3, 3)

    # attentive pool standalone: [VB, T*197, C] tokens -> pooled + head
    from dynamic_tuning_tpu.models.video_vit import AttentiveBlock
    import flax.linen as nn

    class PoolHead(nn.Module):
        @nn.compact
        def __call__(self, tokens, query):
            pooled = AttentiveBlock(cfg.num_heads, cfg.qkv_bias,
                                    cfg.drop_rate, cfg.attn_drop_rate,
                                    dtype=jnp.bfloat16,
                                    name="attentive_blocks")(
                jnp.broadcast_to(query, (tokens.shape[0], 1, 768)), tokens,
                deterministic=True)[:, 0, :]
            return nn.Dense(400, dtype=jnp.float32, name="head")(
                pooled.astype(jnp.float32))

    ph = PoolHead()
    toks = jax.random.normal(jax.random.PRNGKey(2), (VB, T * 197, 768),
                             jnp.bfloat16)
    q = jnp.zeros((1, 1, 768), jnp.float32)
    php = {"attentive_blocks": params["attentive_blocks"],
           "head": params["head"]}
    dtp = device_time(lambda tt, p: ph.apply({"params": p}, tt, q).sum(),
                      toks, php, i1=5, i2=55)
    out["attentive_pool_head_us"] = round(dtp * 1e6, 1)

    # final norm over all B*T*197 tokens (video norms before pooling)
    def final_norm(tt, scale, bias):
        xf = tt.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mu).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias).sum()

    dtn = device_time(final_norm,
                      jax.random.normal(jax.random.PRNGKey(3),
                                        (VB * T, 197, 768), jnp.bfloat16),
                      params["norm"]["scale"], params["norm"]["bias"],
                      i1=5, i2=55)
    out["final_norm_us"] = round(dtn * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
