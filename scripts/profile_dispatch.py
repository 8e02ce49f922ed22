"""Perf isolation on the real TPU chip: where does the dispatch overhead go,
and what is the achievable matmul ceiling for ViT-B shapes?

Run: python scripts/profile_dispatch.py
"""

import json
import time

import jax
import jax.numpy as jnp

B, N, C, H = 128, 197, 768, 3072
ITERS = 10


def timed(name, fn, *args, flops=None):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*a, c)
            return out.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return out

    _ = float(many(*args))
    best = min(_run(many, args) for _ in range(3))
    ips = B * ITERS / best
    msg = {"name": name, "img_s": round(ips, 1),
           "ms_per_batch": round(best / ITERS * 1e3, 3)}
    if flops:
        msg["tflops"] = round(flops * ITERS / best / 1e12, 1)
    print(json.dumps(msg), flush=True)
    return best / ITERS


def _run(many, args):
    t0 = time.perf_counter()
    _ = float(many(*args))
    return time.perf_counter() - t0


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (C, H), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (H, C), jnp.bfloat16) * 0.02
    scores = jax.random.uniform(key, (B, N), jnp.float32)

    # 1. pure MLP matmul ceiling (dense, all tokens)
    def mlp_dense(x, w1, w2, c):
        h = jnp.dot(x + (c != 0).astype(x.dtype), w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16).sum()

    fl = 2 * B * N * C * H * 2
    timed("mlp_dense_197", mlp_dense, x, w1, w2, flops=fl)

    # 2. MLP on 112 tokens (the capacity) — ideal skip ceiling
    x112 = x[:, :112]
    timed("mlp_dense_112", mlp_dense, x112, w1, w2,
          flops=2 * B * 112 * C * H * 2)

    # 3. top_k cost alone
    def topk_only(scores, c):
        v, i = jax.lax.top_k(scores + (c != 0).astype(scores.dtype), 112)
        return v.sum() + i.sum()

    timed("topk_112_of_197", topk_only, scores)

    # 4. gather + MLP(112) + scatter (current dispatch core)
    def dispatch_core(x, w1, w2, scores, c):
        v, idx = jax.lax.top_k(scores + (c != 0).astype(scores.dtype), 112)
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h)
        y = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
        out = jnp.zeros_like(x)
        b = jnp.arange(B)[:, None]
        out = out.at[b, idx].set(y)
        return out.sum()

    timed("dispatch_gather_scatter", dispatch_core, x, w1, w2, scores,
          flops=2 * B * 112 * C * H * 2)

    # 5. gather+MLP only (no scatter) — isolates scatter cost
    def dispatch_noscatter(x, w1, w2, scores, c):
        v, idx = jax.lax.top_k(scores + (c != 0).astype(scores.dtype), 112)
        xg = jnp.take_along_axis(x, idx[..., None], axis=1)
        h = jnp.dot(xg, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16).sum()

    timed("dispatch_no_scatter", dispatch_noscatter, x, w1, w2, scores)

    # 6. masked dense MLP (the mask-multiply train form) — no savings baseline
    def mlp_masked(x, w1, w2, scores, c):
        h = jnp.dot(x + (c != 0).astype(x.dtype), w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h)
        y = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
        return (y * (scores > 0.5)[..., None]).sum()

    timed("mlp_masked_dense", mlp_masked, x, w1, w2, scores)

    # 7. one-hot matmul dispatch (MXU-friendly gather/scatter)
    def dispatch_onehot(x, w1, w2, scores, c):
        v, idx = jax.lax.top_k(scores + (c != 0).astype(scores.dtype), 112)
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)      # [B,112,N]
        xg = jnp.einsum("bkn,bnc->bkc", oh, x)
        h = jnp.dot(xg, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h)
        y = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
        out = jnp.einsum("bkn,bkc->bnc", oh, y)
        return out.sum()

    timed("dispatch_onehot", dispatch_onehot, x, w1, w2, scores)

    # 8. attention cost at 197 (for the full-block picture)
    def attn(x, c):
        q = (x + (c != 0).astype(x.dtype)).reshape(B, N, 12, 64)
        a = jnp.einsum("bnhd,bmhd->bhnm", q * 0.125, q,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a.astype(jnp.bfloat16), q)
        return o.sum()

    timed("attn_score_softmax_av", attn, x)


if __name__ == "__main__":
    main()
