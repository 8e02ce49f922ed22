"""Core DyT layers: Adapter, MoE-Adapter, TokenSelect, Attention, Mlp, Block.

Behavioral spec from the reference (all cites into /root/reference):
  * Adapter           models/dynamic_adapter.py:80-140
  * TokenSelect       models/dynamic_adapter.py:58-77
  * Attention         models/vision_transformer_IN21K.py:27-75
  * Block             models/vision_transformer_IN21K.py:88-185
  * MoE adapter       README.md:27 (paper-only; no reference code exists)

TPU-first design notes:
  * All matmuls run in ``dtype`` (bfloat16 by default) with fp32 params —
    the analogue of the reference's CUDA AMP autocast.  LayerNorm and softmax
    stay fp32, matching autocast behavior.
  * The gate is applied as a static-shape mask-multiply in training (exactly
    the reference's train form); the dynamic-gather "speed" form lives in
    ``models/speed_vit.py`` as a capacity-bounded dispatch.
  * Blocks are plain linen modules so XLA fuses LN + gate + adapter epilogues
    into the MLP matmuls; the hand-written Pallas fused kernels live in
    ``ops/`` and are swapped in via ``use_pallas``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from dynamic_tuning_tpu.config import SelectConfig, TuningConfig
from dynamic_tuning_tpu.ops.gumbel import gumbel_sigmoid

Dtype = Any

# --- initializers -----------------------------------------------------------

def torch_kaiming_uniform(a: float = math.sqrt(5)):
    """torch.nn.init.kaiming_uniform_ on a flax kernel of shape (in, out).

    With a=sqrt(5) (torch Linear default / the reference adapter "lora" init,
    dynamic_adapter.py:114) the bound reduces to 1/sqrt(fan_in).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


# --- stochastic depth --------------------------------------------------------

class DropPath(nn.Module):
    """Per-sample stochastic depth (reference uses timm DropPath; rate 0 by
    default in every recipe — drop_path=0.0, main_image.py:118)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# --- MLP ---------------------------------------------------------------------

class Mlp(nn.Module):
    """timm-style MLP: fc1 -> GELU -> drop -> fc2 -> drop."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    gelu_approx: bool = False
    remat_tags: bool = False    # see remat_block_cls: names the fc1 output
                                # for the "scores" save-list policy (gelu'
                                # and fc1-dx need it; fc2 is frozen so its
                                # input is never needed for a weight grad)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="fc1")(x)
        if self.remat_tags:
            x = checkpoint_name(x, "mlp_h")
        # torch nn.GELU defaults to the exact (erf) form; the tanh approx is
        # ~4x cheaper on the VPU and below bf16 resolution — opt-in knob.
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


# --- Attention ---------------------------------------------------------------

def _relative_position_index(wh: int, ww: int):
    """BEiT-style relative-position index over a (wh, ww) grid + CLS.

    Returns an int32 [N+1, N+1] index into a bias table of size
    (2wh-1)*(2ww-1)+3 (the +3 slots are cls->token, token->cls, cls->cls).
    Used by the segmentation backbone's windowed attention (reference
    dense_tasks/.../segmentation_vision_transformer_IN21K.py:150-195).
    """
    import numpy as np

    n = wh * ww
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij")).reshape(2, -1)  # [2, N]
    rel = coords[:, :, None] - coords[:, None, :]                 # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel + 1          # cls -> token
    idx[0:, 0] = num_rel + 2          # token -> cls
    idx[0, 0] = num_rel               # cls -> cls
    return idx.astype(np.int32), num_rel + 3


def _rel_pos_bias_from_table(table: jax.Array, wh: int, ww: int
                             ) -> jax.Array:
    """[table_size, H] -> [H, N, N] rel-pos bias WITHOUT the flat N^2-index
    gather (XLA gathers are index-bound: the naive ``table[idx]`` costs
    ~2.8 ms per block at N=1025 — 60%+ of the whole seg forward).

    Exploits the Kronecker structure bias[h, i, j] = t3[h, yi-yj, xi-xj]:
    one [wh, wh]-index gather over the dy axis, one [ww, ww] slice-take over
    the dx axis, one 5-D transpose — all large-slice operations.  Exact same
    values as ``table[_relative_position_index(wh, ww)[0]]``.
    """
    n = wh * ww
    H = table.shape[1]
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    t3 = table[:num_rel].reshape(2 * wh - 1, 2 * ww - 1, H)
    dy = jnp.arange(wh)[:, None] - jnp.arange(wh)[None, :] + wh - 1
    dx = jnp.arange(ww)[:, None] - jnp.arange(ww)[None, :] + ww - 1
    g1 = jnp.take(t3, dy.reshape(-1), axis=0)            # [wh*wh, 2ww-1, H]
    g2 = jnp.take(g1, dx.reshape(-1), axis=1)            # [wh*wh, ww*ww, H]
    g2 = g2.reshape(wh, wh, ww, ww, H)                   # [yi, yj, xi, xj, H]
    patch = g2.transpose(4, 0, 2, 1, 3).reshape(H, n, n)
    # CLS specials (slots num_rel .. num_rel+2, matching
    # _relative_position_index): cls->cls, cls->token, token->cls
    cls_cls = jnp.broadcast_to(table[num_rel].reshape(H, 1, 1), (H, 1, 1))
    cls_tok = jnp.broadcast_to(table[num_rel + 1].reshape(H, 1, 1),
                               (H, 1, n))
    tok_cls = jnp.broadcast_to(table[num_rel + 2].reshape(H, 1, 1),
                               (H, n, 1))
    top = jnp.concatenate([cls_cls, cls_tok], axis=2)    # [H, 1, N]
    bottom = jnp.concatenate([tok_cls, patch], axis=2)   # [H, n, N]
    return jnp.concatenate([top, bottom], axis=1)        # [H, N, N]


def _fused_serving_mode() -> str:
    """'1' (on, TPU only), '0' (off), or 'interpret' (tests on CPU)."""
    import os

    return os.environ.get("DYT_FUSED_ATTN", "1")


def _attention_fusable(deterministic: bool, attn_drop: float, num_heads: int,
                       head_dim: int, fused_mode: str) -> bool:
    """Core applicability predicate for the Pallas fused serving kernels —
    the ONE copy shared by ``Attention.__call__`` and ``Block.__call__`` so
    the correctness-critical guard can't drift between them.  Callers add
    their own shape/feature restrictions (N<=512 VMEM bound, window/
    LayerScale/qv-bias exclusions) on top."""
    return (deterministic and attn_drop == 0.0
            and num_heads % 2 == 0 and (2 * head_dim) % 128 == 0
            and fused_mode != "0"
            and (fused_mode == "interpret"
                 or jax.default_backend() == "tpu"))


def _rel_pos_table_size(wh: int, ww: int) -> int:
    """Bias-table length for ``_relative_position_index`` WITHOUT building
    the O(N^2) index matrix: (2wh-1)(2ww-1) relative offsets + 3 CLS slots."""
    return (2 * wh - 1) * (2 * ww - 1) + 3


class Attention(nn.Module):
    """Multi-head self-attention (reference vision_transformer_IN21K.py:27-75).

    Single fused qkv projection; softmax in fp32 (AMP parity).  The
    deterministic/serving path uses the fused Pallas kernel
    (ops/mha_serving.py) which consumes the raw [B,N,3C] qkv buffer and emits
    [B,N,C] directly — the XLA relayouts around the core cost more than the
    attention math itself (scripts/profile_attention.py: 1.12 ms -> 0.67 ms
    per ViT-B block at batch 128).

    ``window_size=(h, w)`` adds a learnable BEiT-style relative-position bias
    over the patch grid + CLS (segmentation backbone).
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    window_size: Optional[Tuple[int, int]] = None
    qv_bias_only: bool = False   # BEiT-style: q/v biases, k bias fixed zero
    remat_tags: bool = False     # name the qkv and post-proj outputs for the
                                 # remat="scores" save-list policy
                                 # (remat_block_cls).  ONLY set inside an
                                 # nn.remat region: free-standing
                                 # checkpoint_name tags force extra
                                 # materialization (measured: baseline train
                                 # step 10.3 -> 17.6 GB HBM, an OOM)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        use_fused_bias = self.qkv_bias and not self.qv_bias_only
        qkv = nn.Dense(3 * C, use_bias=use_fused_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_02, name="qkv")(x)
        if self.qkv_bias and self.qv_bias_only:
            # BEiT attention (reference dense_tasks/.../backbone/beit.py):
            # separate q_bias/v_bias params, k bias identically zero
            q_bias = self.param("q_bias", nn.initializers.zeros_init(),
                                (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros_init(),
                                (C,), jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros((C,), jnp.float32),
                                    v_bias]).astype(qkv.dtype)
            qkv = qkv + bias
        if self.remat_tags:
            qkv = checkpoint_name(qkv, "attn_qkv")

        fused_mode = _fused_serving_mode()
        can_fuse = _attention_fusable(deterministic, self.attn_drop,
                                      self.num_heads, head_dim, fused_mode)
        # the unchunked per-sample core holds a [2N, N] fp32 score tile in
        # VMEM — past ~512 tokens it blows the 16 MB scoped budget inside a
        # full model (the row-chunked windowed kernel handles big N)
        if can_fuse and self.window_size is None and N <= 512:
            from dynamic_tuning_tpu.ops.mha_serving import mha_serving_fused

            out = mha_serving_fused(qkv, heads=self.num_heads,
                                    interpret=fused_mode == "interpret")
            out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_02,
                           name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if (can_fuse and self.window_size is not None
                and self.window_size[0] * self.window_size[1] + 1 == N):
            # windowed (BEiT/seg) serving: bias-aware pair kernel; each
            # pair's [2N, N] bias tile stays VMEM-resident across the batch
            from dynamic_tuning_tpu.ops.mha_serving import mha_windowed_fused

            table_size = _rel_pos_table_size(*self.window_size)
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros_init(),
                               (table_size, self.num_heads), jnp.float32)
            # build in bf16: the kernel takes the bias operand in bf16
            # anyway, and halving the construction's copy traffic is worth
            # ~0.4 ms/block at N=1025
            bias = _rel_pos_bias_from_table(
                table.astype(jnp.bfloat16), *self.window_size)
            out = mha_windowed_fused(qkv, bias, heads=self.num_heads,
                                     interpret=fused_mode == "interpret")
            out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_02,
                           name="proj")(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        # explicit [3,B,H,N,D] layout + batched dot_general: ~27% faster than
        # the einsum lowering on TPU (BENCH.md attention notes), numerically
        # identical
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim
                          ).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                     # [B, H, N, hd]

        attn = jax.lax.dot_general(q * scale, k,
                                   (((3,), (3,)), ((0, 1), (0, 1))),
                                   preferred_element_type=jnp.float32)
        if self.window_size is not None:
            table_size = _rel_pos_table_size(*self.window_size)
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros_init(),
                               (table_size, self.num_heads), jnp.float32)
            attn = attn + _rel_pos_bias_from_table(
                table, *self.window_size)[None]
        if deterministic and self.attn_drop == 0.0:
            # Serving form: softmax without the row-max pass + normalization
            # deferred past the AV matmul (over [N,D] instead of [N,N]).
            # Saves one full pass over the fp32 score tensor (~19% faster
            # attention sublayer).  The two-sided clamp keeps exp finite in
            # both directions: exp(80-20) < fp32 max, and l >= exp(-80) > 0
            # so the deferred divide can't hit 0/0.  Exact to fp32 resolution
            # whenever the row max lies in [-60, 80] (a clamped tail score
            # contributes <= exp(-80)/exp(max-20) ~ 1e-35 relative weight);
            # trained ViT attention logits are well inside that range.
            p = jnp.exp(jnp.clip(attn, -60.0, 80.0) - 20.0).astype(self.dtype)
            out = jax.lax.dot_general(p, v,
                                      (((3,), (2,)), ((0, 1), (0, 1))),
                                      preferred_element_type=jnp.float32)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            out = (out / l).astype(self.dtype)
        else:
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jax.lax.dot_general(attn.astype(self.dtype), v,
                                      (((3,), (2,)), ((0, 1), (0, 1))),
                                      preferred_element_type=self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_02,
                       name="proj")(out)
        if self.remat_tags:
            # with qkv + the post-proj output saved, the backward re-derives
            # the [B,H,N,N] fp32 score/prob tensors from qkv (QK^T + softmax)
            # and never re-runs AV or the projection: dq/dk/dv only need
            # probs and the saved qkv halves (qkv/proj weights are frozen,
            # so their inputs are never needed for a weight grad)
            out = checkpoint_name(out, "attn_out")
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


# --- Adapter -----------------------------------------------------------------

class Adapter(nn.Module):
    """AdaptFormer-style parallel bottleneck adapter
    (reference dynamic_adapter.py:80-140).

    down(d_model -> bottleneck) -> ReLU -> dropout -> up -> * scale.
    "lora" init: kaiming-uniform down kernel, zeros up kernel, zeros biases.
    """

    cfg: TuningConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 add_residual: bool = False) -> jax.Array:
        cfg = self.cfg
        residual = x
        if cfg.ffn_adapter_layernorm_option == "in":
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(x)

        if cfg.ffn_adapter_init_option == "lora":
            down_kinit: Callable = torch_kaiming_uniform()
            up_kinit: Callable = nn.initializers.zeros_init()
        else:  # "bert"
            down_kinit = trunc_normal_02
            up_kinit = trunc_normal_02

        down = nn.Dense(cfg.ffn_num, dtype=self.dtype, kernel_init=down_kinit,
                        bias_init=nn.initializers.zeros_init(), name="down_proj")(x)
        down = nn.relu(down)
        down = nn.Dropout(cfg.dropout)(down, deterministic=deterministic)
        # up-projection width comes from the residual stream, not the config —
        # the adapter must map back to whatever embed_dim the model uses.
        up = nn.Dense(residual.shape[-1], dtype=self.dtype, kernel_init=up_kinit,
                      bias_init=nn.initializers.zeros_init(), name="up_proj")(down)

        if cfg.ffn_adapter_scalar == "learnable_scalar":
            scale = self.param("scale", nn.initializers.ones_init(), (1,), jnp.float32)
            up = up * scale.astype(up.dtype)
        else:
            up = up * float(cfg.ffn_adapter_scalar)

        if cfg.ffn_adapter_layernorm_option == "out":
            up = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(up)

        return up + residual if add_residual else up


class MoEAdapter(nn.Module):
    """MoE-enhanced adapter (paper feature, reference README.md:27; absent from
    the reference code — implemented from the paper description).

    N parallel bottleneck experts blended per-token by a softmax router.  The
    experts are tiny (d_model x bottleneck), so instead of a dispatch we run
    all experts as one batched einsum over a stacked [E, d, b] kernel and blend
    with router weights — dense-MoE, exactly one big MXU-friendly contraction,
    no load-balancing machinery needed.
    """

    cfg: TuningConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 add_residual: bool = False) -> jax.Array:
        cfg = self.cfg
        E, d, b = cfg.moe_experts, x.shape[-1], cfg.ffn_num
        residual = x

        # router: per-token softmax over experts
        router_logits = nn.Dense(E, dtype=jnp.float32, use_bias=False,
                                 kernel_init=nn.initializers.zeros_init(),
                                 name="router")(x.astype(jnp.float32))
        gates = jax.nn.softmax(router_logits / cfg.moe_router_tau, axis=-1)  # [..., E]

        down_k = self.param("down_kernel", _stacked_kaiming(E), (E, d, b), jnp.float32)
        down_b = self.param("down_bias", nn.initializers.zeros_init(), (E, b), jnp.float32)
        up_k = self.param("up_kernel", nn.initializers.zeros_init(), (E, b, d), jnp.float32)
        up_b = self.param("up_bias", nn.initializers.zeros_init(), (E, d), jnp.float32)

        xc = x.astype(self.dtype)
        h = jnp.einsum("...d,edb->...eb", xc, down_k.astype(self.dtype)) + down_b.astype(self.dtype)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        up = jnp.einsum("...eb,ebd->...ed", h, up_k.astype(self.dtype)) + up_b.astype(self.dtype)
        out = jnp.einsum("...ed,...e->...d", up, gates.astype(self.dtype))

        if cfg.ffn_adapter_scalar == "learnable_scalar":
            scale = self.param("scale", nn.initializers.ones_init(), (1,), jnp.float32)
            out = out * scale.astype(out.dtype)
        else:
            out = out * float(cfg.ffn_adapter_scalar)

        return out + residual if add_residual else out


def _stacked_kaiming(n_experts: int):
    base = torch_kaiming_uniform()

    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base(k, shape[1:], dtype) for k in keys])

    return init


def make_adapter(cfg: TuningConfig, dtype: Dtype, name: str = "adaptmlp") -> nn.Module:
    if cfg.moe_experts and cfg.moe_experts > 1:
        return MoEAdapter(cfg, dtype=dtype, name=name)
    return Adapter(cfg, dtype=dtype, name=name)


# --- TokenSelect --------------------------------------------------------------

class TokenSelect(nn.Module):
    """Per-block token router (reference dynamic_adapter.py:58-77).

    A 1-unit linear head scores every non-CLS token; the Gumbel-sigmoid gate
    decides MLP vs skip.  The CLS token is forced on by concatenating ones.
    Needs the 'gate' RNG collection when ``training=True``.
    """

    tau: float = 5.0
    is_hard: bool = True
    threshold: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        # fp32 head: the gate decision is tiny compute but precision-sensitive.
        logits = nn.Dense(1, dtype=jnp.float32, kernel_init=trunc_normal_02,
                          name="mlp_head")(x[:, 1:, :].astype(jnp.float32))
        rng = self.make_rng("gate") if training else None
        gate = gumbel_sigmoid(logits, rng, tau=self.tau, hard=self.is_hard,
                              threshold=self.threshold, training=training)
        cls_on = jnp.ones((b, 1, 1), gate.dtype)
        return jnp.concatenate([cls_on, gate], axis=1), logits


# --- fused-sublayer param containers -------------------------------------------
#
# The whole-sublayer serving kernel (ops/mha_serving.py::attention_sublayer_
# serving) needs raw LN/qkv/proj weights.  These containers declare params
# with EXACTLY the tree the unfused nn.LayerNorm/Attention modules create, so
# a model initialized through either branch has the same checkpoint layout.


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,),
                       jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    n_in: int
    n_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_02, (self.n_in, self.n_out),
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros_init(), (self.n_out,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class _KernelBias(nn.Module):
    n_in: int
    n_out: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.n_in, self.n_out),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(), (self.n_out,),
                       jnp.float32)
        return k, b


class _AdapterParams(nn.Module):
    """down/up bottleneck params mirroring Adapter's tree (standard parallel
    adapter only — no in/out LN, no MoE)."""

    cfg: TuningConfig
    dim: int

    @nn.compact
    def __call__(self):
        if self.cfg.ffn_adapter_init_option == "lora":
            down_init: Callable = torch_kaiming_uniform()
            up_init: Callable = nn.initializers.zeros_init()
        else:
            down_init = up_init = trunc_normal_02
        wd, bd = _KernelBias(self.dim, self.cfg.ffn_num, down_init,
                             name="down_proj")()
        wu, bu = _KernelBias(self.cfg.ffn_num, self.dim, up_init,
                             name="up_proj")()
        if self.cfg.ffn_adapter_scalar == "learnable_scalar":
            scale = self.param("scale", nn.initializers.ones_init(), (1,),
                               jnp.float32)
        else:
            scale = jnp.full((1,), float(self.cfg.ffn_adapter_scalar),
                             jnp.float32)
        return wd, bd, wu, bu, scale


class _BareKernel(nn.Module):
    """Single bias-less kernel param (MoEAdapter's router Dense tree)."""

    shape: Tuple[int, ...]
    init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.init, self.shape, jnp.float32)


class _MoEAdapterParams(nn.Module):
    """Stacked-expert params mirroring MoEAdapter's tree exactly (router
    kernel + down/up expert stacks + optional learnable scale), for the
    fused MoE serving prologue."""

    cfg: TuningConfig
    dim: int

    @nn.compact
    def __call__(self):
        cfg, d = self.cfg, self.dim
        E, b = cfg.moe_experts, cfg.ffn_num
        wrt = _BareKernel((d, E), name="router")()
        down_k = self.param("down_kernel", _stacked_kaiming(E), (E, d, b),
                            jnp.float32)
        down_b = self.param("down_bias", nn.initializers.zeros_init(),
                            (E, b), jnp.float32)
        up_k = self.param("up_kernel", nn.initializers.zeros_init(),
                          (E, b, d), jnp.float32)
        up_b = self.param("up_bias", nn.initializers.zeros_init(), (E, d),
                          jnp.float32)
        if cfg.ffn_adapter_scalar == "learnable_scalar":
            scale = self.param("scale", nn.initializers.ones_init(), (1,),
                               jnp.float32)
        else:
            scale = jnp.full((1,), float(cfg.ffn_adapter_scalar),
                             jnp.float32)
        return wrt, down_k, down_b, up_k, up_b, scale


class _SelectParams(nn.Module):
    """Router-head params mirroring TokenSelect's tree."""

    dim: int

    @nn.compact
    def __call__(self):
        return _KernelBias(self.dim, 1, trunc_normal_02, name="mlp_head")()


class _MlpParams(nn.Module):
    """fc1/fc2 params mirroring Mlp's tree (for the int8 serving kernel)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _KernelBias(self.dim, self.hidden, trunc_normal_02,
                             name="fc1")()
        w2, b2 = _KernelBias(self.hidden, self.dim, trunc_normal_02,
                             name="fc2")()
        return w1, b1, w2, b2


class _AttnParams(nn.Module):
    """qkv + proj (+ BEiT q/v biases) mirroring Attention's param tree."""

    dim: int
    qkv_bias: bool = True
    qv_bias_only: bool = False

    @nn.compact
    def __call__(self):
        use_fused_bias = self.qkv_bias and not self.qv_bias_only
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, use_fused_bias,
                                  name="qkv")()
        if self.qkv_bias and self.qv_bias_only:
            q_bias = self.param("q_bias", nn.initializers.zeros_init(),
                                (self.dim,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros_init(),
                                (self.dim,), jnp.float32)
            bqkv = jnp.concatenate(
                [q_bias, jnp.zeros((self.dim,), jnp.float32), v_bias])
        elif bqkv is None:
            bqkv = jnp.zeros((3 * self.dim,), jnp.float32)
        wproj, bproj = _DenseParams(self.dim, self.dim, True, name="proj")()
        return wqkv, bqkv, wproj, bproj


# --- Transformer block ---------------------------------------------------------

class Block(nn.Module):
    """DyT transformer block (reference vision_transformer_IN21K.py:88-165).

    Pre-norm ViT block; attention always dense; router scores post-attention
    activations; parallel adapter on all tokens; the MLP branch output is
    mask-multiplied by the gate unless ``complete_model`` (teacher) is set.

    Returns ``(x, gate, logits)``; gate/logits are None when ``select=False``.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    select: bool = True
    window_size: Optional[Tuple[int, int]] = None
    gelu_approx: bool = False
    init_values: Optional[float] = None      # LayerScale (reference :78-85)
    qv_bias_only: bool = False               # BEiT-style attention biases
    quant: str = "none"                      # "int8" W8A8 serving matmuls
                                             # (ops/quant.py; eval only)
    remat_tags: bool = False                 # set by remat_block_cls only
                                             # (see Attention.remat_tags)
    tuning: TuningConfig = TuningConfig()
    select_cfg: SelectConfig = SelectConfig()
    dtype: Dtype = jnp.bfloat16

    def _layer_scale(self, name: str, x: jax.Array) -> jax.Array:
        if self.init_values is None:
            return x
        gamma = self.param(name, nn.initializers.constant(self.init_values),
                           (x.shape[-1],), jnp.float32)
        return x * gamma.astype(x.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False,
                 complete_model: bool = False, dispatch: bool = False
                 ) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
        # NOTE: mode flags are positional (not keyword-only) so nn.remat can
        # mark them static via static_argnums
        dim = x.shape[-1]
        deterministic = not training
        head_dim = dim // self.num_heads

        fused_mode = _fused_serving_mode()
        fuse_sublayer = (
            _attention_fusable(deterministic, self.attn_drop,
                               self.num_heads, head_dim, fused_mode)
            and self.window_size is None and self.init_values is None
            and not self.qv_bias_only
            # [2N, N] fp32 score tile must fit the 16 MB scoped-VMEM budget
            # (big-N paths fall back to Attention / the chunked windowed
            # kernel)
            and x.shape[1] <= 512)
        # standard parallel adapter fuses into the prologue kernel;
        # in/out-LN adapters fall back to the module path
        moe_on = bool(self.tuning.moe_experts and self.tuning.moe_experts > 1)
        plain_adapter = (self.tuning.ffn_adapt and not moe_on
                         and self.tuning.ffn_adapter_layernorm_option == "none")
        with_select = bool(self.select and not complete_model)
        gate, logits, adapt_x = None, None, None
        adapter_done = False
        # int8 W8A8 serving (ops/quant.py): the MLP kernel only needs a
        # deterministic forward on TPU; the attention-sublayer kernels also
        # need the fused kernels' applicability conditions
        use_q8_mlp = (
            self.quant in ("int8", "int8_attn") and deterministic
            and fused_mode != "0"
            and (fused_mode == "interpret"
                 or jax.default_backend() == "tpu"))
        use_q8 = use_q8_mlp and fuse_sublayer
        attn_q8 = self.quant == "int8_attn"
        # the MoE-enhanced adapter fuses into BOTH prologues (its
        # stacked-expert mixture is four small matmuls on the VMEM-resident
        # x_mid): bf16 via ops/mha_serving.py::dyt_prologue_serving_moe,
        # int8 via ops/quant.py::dyt_prologue_serving_q8_moe (qkv/proj on
        # the int8 MXU path, the mixture itself stays bf16/fp32)
        moe_fused = (self.tuning.ffn_adapt and moe_on
                     and self.tuning.ffn_adapter_layernorm_option == "none")

        if fuse_sublayer and (plain_adapter or moe_fused):
            # DyT prologue kernel: attention sublayer + adapter + router head
            # in one Pallas program while x_mid is in VMEM (ops/mha_serving.py)
            g, bta = _LNParams(dim, name="norm1")()
            wqkv, bqkv, wproj, bproj = _AttnParams(
                dim, self.qkv_bias, self.qv_bias_only, name="attn")()
            if not moe_fused:
                wd, bd, wu, bu, ascale = _AdapterParams(
                    self.tuning, dim, name="adaptmlp")()
            if with_select:
                wsel, bsel = _SelectParams(dim, name="mlp_token_select")()
            else:
                wsel, bsel = jnp.zeros((dim, 1), jnp.float32), jnp.zeros((1,))
            if moe_fused:
                wrt, down_k, down_b, up_k, up_b, ascale = _MoEAdapterParams(
                    self.tuning, dim, name="adaptmlp")()
                if use_q8:
                    from dynamic_tuning_tpu.ops.quant import \
                        dyt_prologue_serving_q8_moe
                    outs = dyt_prologue_serving_q8_moe(
                        x, g, bta, wqkv, bqkv, wproj, bproj,
                        wrt, down_k.astype(self.dtype), down_b,
                        up_k.astype(self.dtype), up_b, ascale, wsel, bsel,
                        heads=self.num_heads,
                        tau=self.tuning.moe_router_tau,
                        with_select=with_select, attn_q8=attn_q8,
                        interpret=fused_mode == "interpret")
                else:
                    from dynamic_tuning_tpu.ops.mha_serving import \
                        dyt_prologue_serving_moe
                    outs = dyt_prologue_serving_moe(
                        x, g, bta, wqkv.astype(self.dtype), bqkv,
                        wproj.astype(self.dtype), bproj,
                        wrt, down_k, down_b, up_k, up_b, ascale, wsel, bsel,
                        heads=self.num_heads,
                        tau=self.tuning.moe_router_tau,
                        with_select=with_select,
                        interpret=fused_mode == "interpret")
            elif use_q8:
                from dynamic_tuning_tpu.ops.quant import \
                    dyt_prologue_serving_q8
                outs = dyt_prologue_serving_q8(
                    x, g, bta, wqkv, bqkv, wproj, bproj,
                    wd.astype(self.dtype), bd, wu.astype(self.dtype), bu,
                    ascale, wsel, bsel, heads=self.num_heads,
                    with_select=with_select, attn_q8=attn_q8,
                    interpret=fused_mode == "interpret")
            else:
                from dynamic_tuning_tpu.ops.mha_serving import \
                    dyt_prologue_serving
                outs = dyt_prologue_serving(
                    x, g, bta, wqkv.astype(self.dtype), bqkv,
                    wproj.astype(self.dtype), bproj,
                    wd.astype(self.dtype), bd, wu.astype(self.dtype), bu,
                    ascale, wsel, bsel, heads=self.num_heads,
                    with_select=with_select,
                    interpret=fused_mode == "interpret")
            if with_select:
                x, adapt_x, sel = outs
                logits = sel[:, 1:, :]                  # strip CLS row
                from dynamic_tuning_tpu.ops.gumbel import gumbel_sigmoid as _gs
                soft = _gs(logits, None, tau=self.select_cfg.tau, hard=True,
                           threshold=self.select_cfg.threshold, training=False)
                cls_on = jnp.ones((x.shape[0], 1, 1), soft.dtype)
                gate = jnp.concatenate([cls_on, soft], axis=1)
            else:
                x, adapt_x = outs
            adapter_done = True
        elif fuse_sublayer:
            from dynamic_tuning_tpu.ops.mha_serving import \
                attention_sublayer_serving

            g, bta = _LNParams(dim, name="norm1")()
            wqkv, bqkv, wproj, bproj = _AttnParams(
                dim, self.qkv_bias, self.qv_bias_only, name="attn")()
            # x keeps its residual dtype; LN/accumulation are fp32 in-kernel
            if use_q8:
                from dynamic_tuning_tpu.ops.quant import \
                    attention_sublayer_serving_q8
                x = attention_sublayer_serving_q8(
                    x, g, bta, wqkv, bqkv, wproj, bproj,
                    heads=self.num_heads, attn_q8=attn_q8,
                    interpret=fused_mode == "interpret")
            else:
                x = attention_sublayer_serving(
                    x, g, bta, wqkv.astype(self.dtype), bqkv,
                    wproj.astype(self.dtype), bproj, heads=self.num_heads,
                    interpret=fused_mode == "interpret")
        else:
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
            h = Attention(self.num_heads, self.qkv_bias, self.attn_drop,
                          self.proj_drop, window_size=self.window_size,
                          qv_bias_only=self.qv_bias_only,
                          remat_tags=self.remat_tags,
                          dtype=self.dtype, name="attn")(
                              h.astype(self.dtype), deterministic=deterministic)
            x = x + DropPath(self.drop_path, name="drop_path1")(
                self._layer_scale("ls1_gamma", h), deterministic=deterministic)

        # Teacher (complete_model) pass: the reference still evaluates the
        # router but discards its output (vision_transformer_IN21K.py:161);
        # no gradient flows through it, so skipping it here is numerically
        # identical and strictly cheaper.
        if with_select and gate is None:
            gate, logits = TokenSelect(
                tau=self.select_cfg.tau, is_hard=True,
                threshold=self.select_cfg.threshold, dtype=self.dtype,
                name="mlp_token_select")(x, training=training)

        # ffn_adapt=False -> plain ViT block, no adapter params (reference
        # gates the adapter on tuning_config.ffn_adapt,
        # vision_transformer_IN21K.py:152-157)
        if self.tuning.ffn_adapt and not adapter_done:
            adapt_x = make_adapter(self.tuning, self.dtype)(
                x.astype(self.dtype), deterministic=deterministic)

        if use_q8_mlp:
            # int8 LN+MLP kernel consumes raw params (same tree names as the
            # norm2/mlp modules, which are not constructed on this path —
            # flax reserves submodule names at construction time)
            from dynamic_tuning_tpu.ops.quant import q8_ln_mlp
            g2, bt2 = _LNParams(dim, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(dim, int(dim * self.mlp_ratio),
                                        name="mlp")()
            mlp_rows = lambda rows: self._layer_scale("ls2_gamma", q8_ln_mlp(
                rows, g2, bt2, w1, b1, w2, b2, gelu_approx=self.gelu_approx,
                interpret=fused_mode == "interpret"))
        else:
            norm2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name="norm2")
            mlp = Mlp(int(dim * self.mlp_ratio), dim, self.proj_drop,
                      gelu_approx=self.gelu_approx,
                      remat_tags=self.remat_tags, dtype=self.dtype,
                      name="mlp")
            mlp_rows = lambda rows: self._layer_scale(
                "ls2_gamma", mlp(norm2(rows).astype(self.dtype),
                                 deterministic=True))

        if dispatch and gate is not None and not training:
            # Efficient-inference path: capacity-bounded dispatch with the
            # gather/scatter expressed as one-hot matmuls — MXU-native, near
            # zero overhead on TPU (ops/dispatch.py::onehot_dispatch_mlp;
            # TPU-native replacement of model_speed_test.py:243-310).
            from dynamic_tuning_tpu.ops.dispatch import (capacity_for,
                                                         onehot_dispatch_mlp)

            B, N, _ = x.shape
            ratio = (self.select_cfg.capacity_ratio
                     if self.select_cfg.capacity_ratio is not None
                     else self.select_cfg.token_target_ratio)
            K = capacity_for(N - 1, ratio)
            scores = jnp.concatenate(
                [jnp.full((B, 1), jnp.inf, jnp.float32),
                 jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))], axis=1)
            # (ops/quant.py::q8_dispatch_mlp fuses this gather/MLP/scatter
            # into one kernel but measures SLOWER — 714 vs 570 us/block:
            # XLA's batched one-hot matmul + the 128-row-tiled MLP beat the
            # per-sample M=99 tiles; see BENCH.md)
            mlp_x, eff_gate = onehot_dispatch_mlp(
                x, scores, K, mlp_rows, self.select_cfg.threshold)
            # effective gate (what was actually computed), for accounting —
            # fp32 so downstream means/sums don't saturate in bf16
            gate = eff_gate[..., None].astype(jnp.float32)
        elif use_q8_mlp:
            # dense serving MLP on the int8 kernel (DropPath is identity on
            # the deterministic path this branch requires)
            mlp_x = mlp_rows(x)
            if gate is not None and not complete_model:
                mlp_x = gate.astype(mlp_x.dtype) * mlp_x
        else:
            mlp_x = mlp(norm2(x).astype(self.dtype), deterministic=deterministic)
            mlp_x = DropPath(self.drop_path, name="drop_path2")(
                self._layer_scale("ls2_gamma", mlp_x),
                deterministic=deterministic)
            if gate is not None and not complete_model:
                mlp_x = gate.astype(mlp_x.dtype) * mlp_x

        x = x + mlp_x.astype(x.dtype)
        if adapt_x is not None:
            x = x + adapt_x.astype(x.dtype)
        return x, gate, logits

def remat_block_cls(remat, training: bool):
    """Resolve ModelConfig.remat into the Block class the backbone loops
    over.  False/"" -> plain Block; True/"full" -> whole-block
    rematerialization; "scores" -> a SAVE-LIST policy: only the tagged
    bf16 sublayer outputs survive as residuals ("attn_qkv", "attn_out",
    "mlp_h" — see Attention/Mlp), so the dominant activations — the two
    fp32 [B,H,N,N] score/prob tensors per block (477 MB each at batch
    256/N=197) — are re-derived in the backward from the saved qkv
    (QK^T + softmax only; AV/proj/fc2 never re-run because the frozen
    backbone weights need no weight grads, hence no saved inputs).

    Why a save-LIST and not save-anything-EXCEPT the score names: the
    except-policy materializes every other intermediate as an explicit
    residual crossing the checkpoint boundary, defeating XLA's fusion —
    measured 17.6 GB vs the 10.3 GB no-remat baseline (ViT-B, batch 64).
    The save-list keeps the boundary to 3 bf16 tensors per block.

    static_argnums indexes the bound call (module, x, training,
    complete_model, dispatch): the mode flags at 2, 3, 4 must be passed
    positionally by the caller."""
    import functools

    if not (remat and training):
        return Block
    if remat == "scores":
        # remat_tags injects the checkpoint_name markers the policy keys
        # on; the tags exist ONLY inside this remat region (outside one
        # they force extra saves — see Attention.remat_tags)
        return functools.partial(
            nn.remat(Block, static_argnums=(2, 3, 4),
                     policy=jax.checkpoint_policies.save_only_these_names(
                         "attn_qkv", "attn_out", "mlp_h")),
            remat_tags=True)
    return nn.remat(Block, static_argnums=(2, 3, 4))
