"""Round 2 micro-bench: selection alternatives + matmul/gelu isolation."""

import json
import time

import jax
import jax.numpy as jnp

B, N, C, H, K = 128, 197, 768, 3072, 112
ITERS = 200


def timed(name, fn, *args, flops=None):
    @jax.jit
    def many(*a):
        def body(c, _):
            return fn(*a, c).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = min(_one(many, args) for _ in range(3))
    msg = {"name": name, "us_per_iter": round(best / ITERS * 1e6, 1)}
    if flops:
        msg["tflops"] = round(flops * ITERS / best / 1e12, 1)
    print(json.dumps(msg), flush=True)


def _one(many, args):
    t0 = time.perf_counter()
    _ = float(many(*args))
    return time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(0)
    x2d = jax.random.normal(key, (B * N, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (C, H), jnp.bfloat16) * 0.02
    scores = jax.random.uniform(key, (B, N), jnp.float32)

    # pure matmul, fp32 accum
    def mm(x2d, w1, c):
        return jnp.dot(x2d, w1, preferred_element_type=jnp.float32).sum()
    timed("matmul_25216x768x3072_f32acc", mm, x2d, w1,
          flops=2 * B * N * C * H)

    def mm_bf16(x2d, w1, c):
        return jnp.dot(x2d, w1, preferred_element_type=jnp.bfloat16).sum()
    timed("matmul_bf16acc", mm_bf16, x2d, w1, flops=2 * B * N * C * H)

    h = jax.random.normal(key, (B * N, H), jnp.bfloat16)

    def gelu_exact(h, c):
        return jax.nn.gelu(h + c * 0, approximate=False).sum()
    timed("gelu_exact_77M", gelu_exact, h)

    def gelu_tanh(h, c):
        return jax.nn.gelu(h + c * 0, approximate=True).sum()
    timed("gelu_tanh_77M", gelu_tanh, h)

    # selection alternatives
    def topk_exact(scores, c):
        v, i = jax.lax.top_k(scores + (c != 0).astype(scores.dtype), K)
        return v.sum() + i.sum()
    timed("topk_exact", topk_exact, scores)

    def topk_approx(scores, c):
        v, i = jax.lax.approx_max_k(scores + (c != 0).astype(scores.dtype), K)
        return v.sum() + i.sum()
    timed("approx_max_k", topk_approx, scores)

    def compaction(scores, c):
        mask = (scores + (c != 0).astype(scores.dtype)) > 0.5
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(mask & (pos < K), pos, K)      # K = dropped
        idx = jnp.full((B, K + 1), 0, jnp.int32)
        b = jnp.arange(B)[:, None]
        n = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
        idx = idx.at[b, slot].set(n, mode="drop")
        return idx[:, :K].sum().astype(jnp.float32)
    timed("cumsum_compaction", compaction, scores)

    # sort-free gather via one_hot matmul from mask (no index list at all)
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)

    def full_dispatch_approx(x, w1, scores, c):
        v, idx = jax.lax.approx_max_k(scores + (c != 0).astype(scores.dtype), K)
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=jnp.bfloat16)
        return h.sum()
    timed("approxk_gather_mlp1", full_dispatch_approx, x, w1, scores,
          flops=2 * B * K * C * H)


if __name__ == "__main__":
    main()
