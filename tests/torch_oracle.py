"""Parameterized torch oracle of the reference's eval-forward semantics.

Implements the DyT ViT eval computation (patch embed -> pre-norm blocks with
deterministic sigmoid>0.5 token gates, parallel ReLU-bottleneck adapter,
gated MLP -> final LN -> CLS head) in torch at ANY shape, from a timm-style
state dict — the reference's model is models/vision_transformer_IN21K.py
(blocks :88-165, forward :343-385) loaded via main_image.py:219-256.

Used by tests/test_full_scale_parity.py to pin numerical fidelity at the
reference's real operating point (ViT-B/16, 224^2, 12 blocks, 768 dim)
without committing a 344 MB fixture: the state dict is regenerated
deterministically from a seed, and the oracle runs at test time (torch CPU
is in the sandbox).  make_golden_fixture.py remains the committed-artifact
variant at toy scale.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as tF


def make_vit_state_dict(rs: np.random.RandomState, *, depth: int, dim: int,
                        ffn: int, classes: int, img: int, patch: int,
                        router_scale: float = 25.0,
                        in_chans: int = 3) -> dict:
    """Random-but-realistic timm+DyT state dict (IN21K-like weight scales:
    trunc-normal-.02-class stats, LN near 1, zero-mean biases).  The router
    head is scaled up so hard sigmoid>0.5 gates have margin against
    cross-framework float noise (same trick as the committed toy fixture)."""
    grid = img // patch
    T = grid * grid + 1

    def w(*shape, s=0.03):
        return np.clip(rs.randn(*shape) * s, -2 * s, 2 * s).astype(np.float32)

    sd = {
        "cls_token": w(1, 1, dim, s=0.02),
        "pos_embed": w(1, T, dim, s=0.02),
        "patch_embed.proj.weight": w(dim, in_chans, patch, patch, s=0.06),
        "patch_embed.proj.bias": w(dim, s=0.02),
        "norm.weight": 1.0 + w(dim, s=0.05),
        "norm.bias": w(dim, s=0.02),
        "head.weight": w(classes, dim, s=0.02),
        "head.bias": w(classes, s=0.01),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1.0 + w(dim, s=0.05),
            p + "norm1.bias": w(dim, s=0.02),
            p + "attn.qkv.weight": w(3 * dim, dim),
            p + "attn.qkv.bias": w(3 * dim, s=0.02),
            p + "attn.proj.weight": w(dim, dim),
            p + "attn.proj.bias": w(dim, s=0.02),
            p + "norm2.weight": 1.0 + w(dim, s=0.05),
            p + "norm2.bias": w(dim, s=0.02),
            p + "mlp.fc1.weight": w(4 * dim, dim),
            p + "mlp.fc1.bias": w(4 * dim, s=0.02),
            p + "mlp.fc2.weight": w(dim, 4 * dim),
            p + "mlp.fc2.bias": w(dim, s=0.02),
            p + "adaptmlp.down_proj.weight": w(ffn, dim),
            p + "adaptmlp.down_proj.bias": w(ffn, s=0.02),
            p + "adaptmlp.up_proj.weight": w(dim, ffn, s=0.02),
            p + "adaptmlp.up_proj.bias": w(dim, s=0.01),
            p + "mlp_token_select.mlp_head.weight":
                (rs.randn(1, dim) * router_scale / np.sqrt(dim)
                 ).astype(np.float32),
            p + "mlp_token_select.mlp_head.bias": w(1, s=0.1),
        })
    return sd


def _t(v):
    return torch.from_numpy(np.array(v, np.float32, copy=True))


@torch.no_grad()
def flax_block_stack(p: dict, h: torch.Tensor, *, depth: int, heads: int,
                     keep_layers: int = 0, complete_model: bool = False,
                     adapter_scale: float = 0.1,
                     window_index=None, qv_bias_only: bool = False,
                     layer_scale: bool = False, tap: int = None):
    """Run the DyT block stack in torch from FLAX-layout params (eval mode,
    deterministic sigmoid>0.5 gates).  Covers the windowed/BEiT options:
    ``window_index`` is the [N, N] relative-position index into
    ``relative_position_bias_table`` (the straightforward table[idx] gather
    the reference uses, seg backbone :150-195 — an independent check of our
    Kronecker-structured build), ``qv_bias_only`` the BEiT q/v-only biases,
    ``layer_scale`` the ls1/ls2 gammas.

    Returns (h, gates [B, L, N-1], tapped, margin) where ``tapped`` is the
    residual stream after block ``tap`` (pre-neck seg feature) and
    ``margin`` the min |router logit| (gate-flip headroom)."""
    B, N, dim = h.shape

    def lin(v, *path, bias=True):
        w = p[path + ("kernel",)].T
        return tF.linear(v, w, p[path + ("bias",)] if bias else None)

    def ln(v, *path):
        return tF.layer_norm(v, (dim,), p[path + ("scale",)],
                             p[path + ("bias",)], eps=1e-6)

    gates, tapped, margin = [], None, float("inf")
    for i in range(depth):
        blk = (f"blocks_{i}",)
        a = ln(h, *blk, "norm1")
        if qv_bias_only:
            qkv = lin(a, *blk, "attn", "qkv", bias=False)
            bias = torch.cat([p[blk + ("attn", "q_bias")],
                              torch.zeros(dim),
                              p[blk + ("attn", "v_bias")]])
            qkv = qkv + bias
        else:
            qkv = lin(a, *blk, "attn", "qkv")
        q, k, v = qkv.reshape(B, N, 3, heads, dim // heads).permute(
            2, 0, 3, 1, 4)
        if window_index is not None:
            table = p[blk + ("attn", "relative_position_bias_table")]
            bias = table[torch.from_numpy(window_index).long()]  # [N,N,H]
            att = tF.scaled_dot_product_attention(
                q, k, v, attn_mask=bias.permute(2, 0, 1)[None])
        else:
            att = tF.scaled_dot_product_attention(q, k, v)
        att = lin(att.transpose(1, 2).reshape(B, N, dim), *blk, "attn",
                  "proj")
        if layer_scale:
            att = att * p[blk + ("ls1_gamma",)]
        h = h + att

        gate_full = None
        if i >= keep_layers and not complete_model:
            logits = lin(h[:, 1:], *blk, "mlp_token_select", "mlp_head")
            margin = min(margin, logits.abs().min().item())
            gate = (torch.sigmoid(logits) > 0.5).float()
            gates.append(gate[..., 0])
            gate_full = torch.cat([torch.ones(B, 1, 1), gate], 1)

        down = tF.relu(lin(h, *blk, "adaptmlp", "down_proj"))
        adapt = lin(down, *blk, "adaptmlp", "up_proj") * adapter_scale

        mlp = lin(tF.gelu(lin(ln(h, *blk, "norm2"), *blk, "mlp", "fc1")),
                  *blk, "mlp", "fc2")
        if layer_scale:
            mlp = mlp * p[blk + ("ls2_gamma",)]
        if gate_full is not None:
            mlp = gate_full * mlp
        h = h + mlp + adapt
        if tap is not None and i == tap:
            tapped = h.clone()
    gate_stack = (torch.stack(gates, 1).numpy() if gates
                  else np.zeros((B, 0, N - 1), np.float32))
    return h, gate_stack, tapped, margin


@torch.no_grad()
def seg_backbone_oracle(flat: dict, x: np.ndarray, *, depth: int, heads: int,
                        patch: int, window_index, tap: int,
                        qv_bias_only: bool = False,
                        layer_scale: bool = False,
                        use_abs_pos: bool = True,
                        complete_model: bool = False):
    """Seg/BEiT backbone eval forward from flax params: patch embed + cls +
    windowed rel-pos blocks; returns (tapped stride-16 feature tokens
    [B, N-1, D] = the model's raw f3, gates)."""
    p = {k: _t(v) for k, v in flat.items()}
    w = p[("patch_embed", "proj", "kernel")].permute(3, 2, 0, 1)
    h = tF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), w,
                  p[("patch_embed", "proj", "bias")], stride=patch)
    B = h.shape[0]
    dim = h.shape[1]
    h = h.flatten(2).transpose(1, 2)
    h = torch.cat([p[("cls_token",)].expand(B, -1, -1), h], 1)
    if use_abs_pos:
        h = h + p[("pos_embed",)]
    _, gates, tapped, margin = flax_block_stack(
        p, h, depth=depth, heads=heads, window_index=window_index,
        qv_bias_only=qv_bias_only, layer_scale=layer_scale,
        complete_model=complete_model, tap=tap)
    return tapped[:, 1:].numpy(), gates, margin


@torch.no_grad()
def video_oracle(flat: dict, x: np.ndarray, *, depth: int, heads: int,
                 patch: int, complete_model: bool = False):
    """Video eval forward from flax params (reference
    video_vision_transformer_IN21K.py:436-481): time folds into batch,
    per-frame DyT blocks, final LN, then the zero-init query token
    cross-attends over ALL frame tokens (AttentiveBlock :27-49,
    CrossAttention :52-110 — separate q/k/v projections, q/v biases only)
    and the pooled query feeds the head."""
    p = {k: _t(v) for k, v in flat.items()}
    B, T = x.shape[:2]
    xf = x.reshape(B * T, *x.shape[2:])
    w = p[("patch_embed", "proj", "kernel")].permute(3, 2, 0, 1)
    h = tF.conv2d(torch.from_numpy(xf).permute(0, 3, 1, 2), w,
                  p[("patch_embed", "proj", "bias")], stride=patch)
    dim = h.shape[1]
    h = h.flatten(2).transpose(1, 2)
    h = torch.cat([p[("cls_token",)].expand(B * T, -1, -1), h], 1)
    h = h + p[("pos_embed",)]
    h, gates, _, margin = flax_block_stack(p, h, depth=depth, heads=heads,
                                           complete_model=complete_model)
    h = tF.layer_norm(h, (dim,), p[("norm", "scale")], p[("norm", "bias")],
                      eps=1e-6)
    kv = h.reshape(B, T * h.shape[1], dim)

    ab = ("attentive_blocks",)
    q_in = p[("query_token",)].expand(B, -1, -1)

    def ab_ln(v, name):
        return tF.layer_norm(v, (dim,), p[ab + (name, "scale")],
                             p[ab + (name, "bias")], eps=1e-6)

    q = ab_ln(q_in, "norm_q")
    k = ab_ln(kv, "norm_k")
    v = ab_ln(kv, "norm_v")
    ca = ab + ("cross_attn",)
    q = tF.linear(q, p[ca + ("q", "kernel")].T) + p[ca + ("q_bias",)]
    k = tF.linear(k, p[ca + ("k", "kernel")].T)
    v = tF.linear(v, p[ca + ("v", "kernel")].T) + p[ca + ("v_bias",)]
    hd = dim // heads
    q = q.reshape(B, 1, heads, hd).transpose(1, 2)
    k = k.reshape(B, -1, heads, hd).transpose(1, 2)
    v = v.reshape(B, -1, heads, hd).transpose(1, 2)
    att = tF.scaled_dot_product_attention(q, k, v)
    att = att.transpose(1, 2).reshape(B, 1, dim)
    pooled = tF.linear(att, p[ca + ("proj", "kernel")].T,
                       p[ca + ("proj", "bias")])[:, 0]
    out = tF.linear(pooled, p[("head", "kernel")].T, p[("head", "bias")])
    return out.numpy(), gates, margin


class TorchDyTTrainer:
    """Torch mirror of the full DyT training step for loss-curve parity.

    Mirrors the reference training semantics (engine_finetune.py:16-106):
    student forward with straight-through gumbel-sigmoid gates + teacher
    forward (complete_model), 4-term loss (AdaLoss CE + budget, teacher CE,
    batchmean log-target KL), AdamW on the trainable params (adapters +
    routers + head; main_image.py:249-256,285) with the per-iteration
    warmup+cosine LR (util/lr_sched.py:9-21).

    Noise-free contract: gate noise is fixed at zero (the JAX side patches
    jax.random.logistic to zeros), every dropout/drop-path rate is 0, so the
    two frameworks compute the same deterministic trajectory.

    Consumes a FLAX param tree (flat {path-tuple: np.ndarray}) so both sides
    start from bit-identical weights without a checkpoint round-trip.
    """

    def __init__(self, flat_params: dict, *, heads: int, depth: int,
                 patch: int, tau: float = 5.0, adapter_scale: float = 0.1,
                 target_ratio: float = 0.5, token_loss_ratio: float = 2.0,
                 weight_decay: float = 0.01, betas=(0.9, 0.999),
                 fulltune: bool = False):
        self.heads, self.depth, self.patch = heads, depth, patch
        self.tau, self.ascale = tau, adapter_scale
        self.target, self.tlr = target_ratio, token_loss_ratio
        self.p = {}
        trainable = []
        for path, v in flat_params.items():
            t = torch.from_numpy(np.array(v, np.float32, copy=True))
            # reference freeze rule: adapters + routers + head train;
            # --fulltune (main_image.py:254) trains everything
            if fulltune or any(k in path for k in ("adaptmlp",
                                                   "mlp_token_select")) \
                    or path[0] == "head":
                t.requires_grad_(True)
                trainable.append(t)
            self.p[path] = t
        self.opt = torch.optim.AdamW(trainable, lr=0.0, betas=betas,
                                     eps=1e-8, weight_decay=weight_decay)

    def _lin(self, h, *path):
        return tF.linear(h, self.p[path + ("kernel",)].T,
                         self.p[path + ("bias",)])

    def _ln(self, h, *path):
        return tF.layer_norm(h, (h.shape[-1],), self.p[path + ("scale",)],
                             self.p[path + ("bias",)], eps=1e-6)

    def forward(self, x: np.ndarray, complete_model: bool):
        B = x.shape[0]
        w = self.p[("patch_embed", "proj", "kernel")].permute(3, 2, 0, 1)
        h = tF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), w,
                      self.p[("patch_embed", "proj", "bias")],
                      stride=self.patch)
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat([self.p[("cls_token",)].expand(B, -1, -1), h], 1)
        h = h + self.p[("pos_embed",)]
        dim = h.shape[-1]
        T = h.shape[1]
        ts = []
        for i in range(self.depth):
            blk = (f"blocks_{i}",)
            a = self._ln(h, *blk, "norm1")
            qkv = self._lin(a, *blk, "attn", "qkv")
            q, k, v = qkv.reshape(B, T, 3, self.heads,
                                  dim // self.heads).permute(2, 0, 3, 1, 4)
            att = tF.scaled_dot_product_attention(q, k, v)
            h = h + self._lin(att.transpose(1, 2).reshape(B, T, dim),
                              *blk, "attn", "proj")
            gate_full = None
            if not complete_model:
                logits = self._lin(h[:, 1:], *blk, "mlp_token_select",
                                   "mlp_head")
                soft = torch.sigmoid(logits / self.tau)   # zero gumbel noise
                hard = (soft > 0.5).float()
                gate = soft + (hard - soft).detach()      # straight-through
                ts.append(gate)
                gate_full = torch.cat([torch.ones(B, 1, 1), gate], 1)
            down = tF.relu(self._lin(h, *blk, "adaptmlp", "down_proj"))
            adapt = self._lin(down, *blk, "adaptmlp", "up_proj") * self.ascale
            mlp = self._lin(tF.gelu(self._lin(self._ln(h, *blk, "norm2"),
                                              *blk, "mlp", "fc1")),
                            *blk, "mlp", "fc2")
            if gate_full is not None:
                mlp = gate_full * mlp
            h = h + mlp + adapt
        h = self._ln(h, "norm")
        out = self._lin(h[:, 0], "head")
        return out, (torch.stack(ts, 1) if ts else None)

    def step(self, x: np.ndarray, y: np.ndarray, lr: float) -> dict:
        """One train step; returns the loss parts as floats."""
        yt = torch.from_numpy(y)
        student, ts = self.forward(x, complete_model=False)
        teacher, _ = self.forward(x, complete_model=True)
        base = tF.cross_entropy(student, yt)
        tok = self.tlr * (ts.mean() - self.target) ** 2
        teacher_ce = tF.cross_entropy(teacher, yt)
        ls = tF.log_softmax(student, -1)
        lt = tF.log_softmax(teacher.detach(), -1)
        kl = (torch.exp(lt) * (lt - ls)).sum() / x.shape[0]
        total = base + tok + teacher_ce + kl
        for g in self.opt.param_groups:
            g["lr"] = float(lr)
        self.opt.zero_grad()
        total.backward()
        self.opt.step()
        return dict(loss=total.item(), base_loss=base.item(),
                    token_loss=tok.item(), teacher_loss=teacher_ce.item(),
                    distillation_loss=kl.item(),
                    keep_ratio=ts.detach().mean().item())


@torch.no_grad()
def image_oracle(sd: dict, x: np.ndarray, *, depth: int, heads: int,
                 patch: int, keep_layers: int = 0,
                 complete_model: bool = False, adapter_scale: float = 0.1):
    """Reference eval forward (vision_transformer_IN21K.py:343-385) in fp32.

    Returns (logits [B,classes], gates [B,L,T-1] for gated blocks,
    margin = min |router logit| over gated blocks — gate-flip headroom)."""
    dim = sd["cls_token"].shape[-1]
    B = x.shape[0]
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    h = tF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                  t["patch_embed.proj.weight"], t["patch_embed.proj.bias"],
                  stride=patch)
    h = h.flatten(2).transpose(1, 2)
    T = h.shape[1] + 1
    h = torch.cat([t["cls_token"].expand(B, -1, -1), h], 1) + t["pos_embed"]

    def lin(v, name):
        return tF.linear(v, t[name + ".weight"], t[name + ".bias"])

    def ln(v, name):
        return tF.layer_norm(v, (dim,), t[name + ".weight"],
                             t[name + ".bias"], eps=1e-6)

    gates, margin = [], float("inf")
    for i in range(depth):
        p = f"blocks.{i}"
        a = ln(h, p + ".norm1")
        qkv = lin(a, p + ".attn.qkv")
        q, k, v = qkv.reshape(B, T, 3, heads, dim // heads).permute(
            2, 0, 3, 1, 4)
        att = tF.scaled_dot_product_attention(q, k, v)
        h = h + lin(att.transpose(1, 2).reshape(B, T, dim), p + ".attn.proj")

        gated = i >= keep_layers
        if gated:
            logits = lin(h[:, 1:], p + ".mlp_token_select.mlp_head")
            margin = min(margin, logits.abs().min().item())
            gate = (torch.sigmoid(logits) > 0.5).float()
            gates.append(gate[..., 0])
            gate = torch.cat([torch.ones(B, 1, 1), gate], 1)

        down = tF.relu(lin(h, p + ".adaptmlp.down_proj"))
        adapt = lin(down, p + ".adaptmlp.up_proj") * adapter_scale

        mlp = lin(tF.gelu(lin(ln(h, p + ".norm2"), p + ".mlp.fc1")),
                  p + ".mlp.fc2")
        if gated and not complete_model:
            mlp = gate * mlp
        h = h + mlp + adapt
    h = ln(h, "norm")
    out = lin(h[:, 0], "head")
    gate_stack = (torch.stack(gates, 1).numpy() if gates
                  else np.zeros((B, 0, T - 1), np.float32))
    return out.numpy(), gate_stack, margin
