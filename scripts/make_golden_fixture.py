"""Generate the golden-logit checkpoint fixture (tests/fixtures/golden_vit.npz).

Builds a small DyT-finetuned-style torch state dict (timm ViT keys + the
reference's adaptmlp/mlp_token_select keys, models/vision_transformer_IN21K.py)
plus an input batch, computes golden logits with a torch oracle implementing
the reference eval semantics, and saves everything.  The committed fixture
lets CI assert end-to-end checkpoint fidelity (import_pretrained -> full
forward -> logits) without network access — the reference's load path is
main_image.py:219-256.

Run: python scripts/make_golden_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn.functional as tF

D, HEADS, DEPTH, FFN, CLASSES = 128, 2, 2, 8, 10
IMG, PATCH = 64, 16
GRID = IMG // PATCH
T = GRID * GRID + 1
B = 2


def make_state_dict(rs):
    def w(*shape, s=0.05):
        return (rs.randn(*shape) * s).astype(np.float32)

    sd = {
        "cls_token": w(1, 1, D),
        "pos_embed": w(1, T, D),
        "patch_embed.proj.weight": w(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": w(D),
        "norm.weight": 1.0 + w(D),
        "norm.bias": w(D),
        "head.weight": w(CLASSES, D),
        "head.bias": w(CLASSES),
        # exercised drop path: pre_logits must be removed by the importer
        "pre_logits.fc.weight": w(D, D),
        "pre_logits.fc.bias": w(D),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": 1.0 + w(D), p + "norm1.bias": w(D),
            p + "attn.qkv.weight": w(3 * D, D), p + "attn.qkv.bias": w(3 * D),
            p + "attn.proj.weight": w(D, D), p + "attn.proj.bias": w(D),
            p + "norm2.weight": 1.0 + w(D), p + "norm2.bias": w(D),
            p + "mlp.fc1.weight": w(4 * D, D), p + "mlp.fc1.bias": w(4 * D),
            p + "mlp.fc2.weight": w(D, 4 * D), p + "mlp.fc2.bias": w(D),
            # DyT params (reference-finetuned checkpoints carry these)
            p + "adaptmlp.down_proj.weight": w(FFN, D),
            p + "adaptmlp.down_proj.bias": w(FFN),
            p + "adaptmlp.up_proj.weight": w(D, FFN),
            p + "adaptmlp.up_proj.bias": w(D),
            p + "mlp_token_select.mlp_head.weight": w(1, D, s=1.5),
            p + "mlp_token_select.mlp_head.bias": w(1),
        })
    return sd


def oracle_forward(sd, x, complete_model):
    """Reference eval forward in torch: vision_transformer_IN21K.py:144-385."""
    x = torch.tensor(x).permute(0, 3, 1, 2)
    h = tF.conv2d(x, torch.tensor(sd["patch_embed.proj.weight"]),
                  torch.tensor(sd["patch_embed.proj.bias"]), stride=PATCH)
    h = h.flatten(2).transpose(1, 2)                    # [B, 16, D]
    cls = torch.tensor(sd["cls_token"]).expand(h.shape[0], -1, -1)
    h = torch.cat([cls, h], dim=1) + torch.tensor(sd["pos_embed"])

    def lin(v, wname):
        return tF.linear(v, torch.tensor(sd[wname + ".weight"]),
                         torch.tensor(sd[wname + ".bias"]))

    def ln(v, wname):
        return tF.layer_norm(v, (D,), torch.tensor(sd[wname + ".weight"]),
                             torch.tensor(sd[wname + ".bias"]), eps=1e-6)

    gate_margins = []
    for i in range(DEPTH):
        p = f"blocks.{i}"
        a = ln(h, p + ".norm1")
        qkv = lin(a, p + ".attn.qkv")
        q, k, v = qkv.reshape(B, T, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
        att = tF.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, T, D)
        h = h + lin(att, p + ".attn.proj")

        logits = lin(h[:, 1:], p + ".mlp_token_select.mlp_head")
        gate_margins.append((torch.sigmoid(logits) - 0.5).abs().min().item())
        gate = (torch.sigmoid(logits) > 0.5).float()
        gate = torch.cat([torch.ones(B, 1, 1), gate], dim=1)

        down = tF.relu(lin(h, p + ".adaptmlp.down_proj"))
        adapt = lin(down, p + ".adaptmlp.up_proj") * 0.1

        mlp = lin(tF.gelu(lin(ln(h, p + ".norm2"), p + ".mlp.fc1")),
                  p + ".mlp.fc2")
        if not complete_model:
            mlp = gate * mlp
        h = h + mlp + adapt
    h = ln(h, "norm")
    out = lin(h[:, 0], "head")
    return out.numpy(), min(gate_margins)


def main():
    for seed in range(7, 64):
        rs = np.random.RandomState(seed)
        sd = make_state_dict(rs)
        x = rs.randn(B, IMG, IMG, 3).astype(np.float32) * 0.5
        logits_eval, margin = oracle_forward(sd, x, complete_model=False)
        logits_teacher, _ = oracle_forward(sd, x, complete_model=True)
        if margin > 0.02:  # no borderline 0.5 crossing -> gate stable in fp32
            print(f"seed {seed}: gate margin {margin:.3f}")
            break
    else:
        raise AssertionError("no seed with a stable gate margin found")
    out = {"x": x, "logits_eval": logits_eval, "logits_teacher": logits_teacher}
    out.update({"sd/" + k: v for k, v in sd.items()})
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "golden_vit.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} (gate margin {margin:.3f})")


if __name__ == "__main__":
    main()
