"""Seg backbone component ablation at ADE20K shapes: where does the
forward time go?  depth-12 vs depth-4 isolates the per-block in-situ cost;
a no-rel-pos variant isolates the windowed-bias cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.seg_vit import SegVisionTransformer

B, ITERS, REPEATS = 4, 8, 4


def bench(depth, out_idx, rel_pos=True):
    cfg = ModelConfig(img_size=512, num_classes=0, gelu_approx=True,
                      residual_dtype="bfloat16", depth=depth)
    m = SegVisionTransformer(cfg, tuning=TuningConfig(),
                             select=SelectConfig(token_target_ratio=0.5),
                             out_indices=out_idx, use_rel_pos_bias=rel_pos,
                             dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 3),
                          jnp.float32)
    p = m.init(jax.random.PRNGKey(1), x[:1])["params"]

    @jax.jit
    def many(pp, xx):
        def body(c, _):
            feats, _sel = m.apply({"params": pp}, xx + (c != 0).astype(xx.dtype),
                                  dispatch=True)
            return sum(f.astype(jnp.float32).sum() for f in feats), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(p, x))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(many(p, x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


if __name__ == "__main__":
    t12 = bench(12, (3, 5, 7, 11))
    t4 = bench(4, (0, 1, 2, 3))
    t12n = bench(12, (3, 5, 7, 11), rel_pos=False)
    print(f"depth12        : {t12*1e3:7.2f} ms/fwd ({B/t12:.1f} crops/s)")
    print(f"depth4         : {t4*1e3:7.2f} ms/fwd")
    print(f"depth12 no-bias: {t12n*1e3:7.2f} ms/fwd ({B/t12n:.1f} crops/s)")
    print(f"per-block marginal: {(t12-t4)/8*1e3:.3f} ms; "
          f"bias share/blk: {(t12-t12n)/12*1e3:.3f} ms")
