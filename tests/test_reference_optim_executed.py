"""Reference-EXECUTED parity for the optimizer/metric utilities.

The torch side of every assertion here runs code imported unmodified from
``/root/reference``: ``util/lars.py`` (MoCo-v3 LARS), ``util/lr_decay.py``
(BEiT layer-wise lr decay) and ``util/metrics.py``.  These are the last
util components that were pinned only against hand transcriptions
(tests/test_optim_extras.py keeps the formula-level tests; this module
upgrades the oracle to the reference's own program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dynamic_tuning_tpu.train.optim import lars, layerwise_lr_decay_mask
from dynamic_tuning_tpu.utils.metrics import mean_per_class_accuracy

from tests.reference_oracle import (build_reference_image_model,
                                    load_reference_optim_utils,
                                    reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")


# ---------------------------------------------------------------------------
# LARS: 5-step trajectory, executed torch optimizer vs our optax transform
# ---------------------------------------------------------------------------

def test_lars_executed_trajectory():
    """util/lars.py LARS.step() executed for 5 steps on a mixed 2-D/1-D
    param set vs our optax ``lars``: weight decay + trust ratio on >1-D
    params only (lars.py:31-40), momentum buffer mu = m*mu + dp, update
    p -= lr*mu (lars.py:42-47)."""
    mod = load_reference_optim_utils()["lars"]
    lr, wd, mom, tc = 0.1, 0.01, 0.9, 0.001
    rs = np.random.RandomState(3)
    p0 = {"w": rs.randn(6, 5).astype(np.float32),
          "k": rs.randn(4, 3, 2).astype(np.float32),   # >2-D also scaled
          "b": rs.randn(5).astype(np.float32)}          # 1-D: plain momentum
    steps = [{k: rs.randn(*v.shape).astype(np.float32)
              for k, v in p0.items()} for _ in range(5)]
    keys = sorted(p0)

    # --- executed reference optimizer ------------------------------------
    tp = {k: torch.nn.Parameter(torch.from_numpy(p0[k].copy()))
          for k in keys}
    opt = mod.LARS([tp[k] for k in keys], lr=lr, weight_decay=wd,
                   momentum=mom, trust_coefficient=tc)
    for g in steps:
        for k in keys:
            tp[k].grad = torch.from_numpy(g[k].copy())
        opt.step()

    # --- ours --------------------------------------------------------------
    tx = lars(lr, weight_decay=wd, momentum=mom, trust_coefficient=tc)
    params = {k: jnp.asarray(v) for k, v in p0.items()}
    state = tx.init(params)
    for g in steps:
        upd, state = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                               state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    for k in keys:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   tp[k].detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# layer-wise lr decay: executed param_groups_lrd on the reference ViT
# ---------------------------------------------------------------------------

def _translate(name: str):
    """torch param name -> our flax-style key path (blocks.i.* -> blocks_i)."""
    parts = name.split(".")
    if parts[0] == "blocks":
        return tuple(["blocks_" + parts[1]] + parts[2:])
    return tuple(parts)


def test_param_groups_lrd_executed_scales():
    """util/lr_decay.py param_groups_lrd executed on the reference ViT
    (depth 4 => num_layers=5, lr_decay.py:23-25) vs our
    ``layerwise_lr_decay_mask``: identical per-parameter lr_scale for every
    trainable param — embeds layer 0, blocks.i -> i+1, head/norm -> top."""
    depth, decay = 4, 0.65
    ref = build_reference_image_model(img=32, patch=16, dim=32, depth=depth,
                                      heads=2, classes=10, ffn=8)
    lrd = load_reference_optim_utils()["lr_decay"]
    groups = lrd.param_groups_lrd(
        ref, weight_decay=0.05,
        no_weight_decay_list=ref.no_weight_decay(), layer_decay=decay)

    # executed per-param scale, recovered by tensor identity
    scale_of = {}
    wd_of = {}
    for g in groups:
        for p in g["params"]:
            scale_of[id(p)] = g["lr_scale"]
            wd_of[id(p)] = g["weight_decay"]

    named = [(n, p) for n, p in ref.named_parameters() if p.requires_grad]
    assert len(named) == len(scale_of) >= 20

    ours = layerwise_lr_decay_mask(
        {_translate(n): None for n, _ in named},
        num_layers=depth, decay_rate=decay)
    for n, p in named:
        assert ours[_translate(n)] == pytest.approx(scale_of[id(p)],
                                                    rel=1e-12), n
        # executed wd rule (documented; our live recipe is uniform-wd AdamW
        # per main_image.py:285): 1-D params and no_weight_decay() names
        # get 0.0
        want_wd = 0.0 if (p.ndim == 1 or n in ref.no_weight_decay()) \
            else 0.05
        assert wd_of[id(p)] == want_wd, n

    # layer-id extremes pinned against the executed helper directly
    nl = depth + 1
    assert lrd.get_layer_id_for_vit("cls_token", nl) == 0
    assert lrd.get_layer_id_for_vit("patch_embed.proj.weight", nl) == 0
    assert lrd.get_layer_id_for_vit(f"blocks.{depth-1}.attn.qkv.weight",
                                    nl) == depth
    assert lrd.get_layer_id_for_vit("head.weight", nl) == nl


# ---------------------------------------------------------------------------
# mean_per_class_accuracy: absent-class semantics, executed
# ---------------------------------------------------------------------------

def test_mean_per_class_executed_absent_classes():
    """util/metrics.py:14-26 executed: recall is averaged over ALL
    num_classes — classes absent from the labels contribute 0 via the
    clamp(gt,min=1) denominator.  Our metric matches on a split that is
    missing two classes (the all-present case is pinned in
    test_reference_engine_executed.py)."""
    refm = load_reference_optim_utils()["metrics"]
    rs = np.random.RandomState(0)
    logits = rs.randn(40, 6).astype(np.float32)
    labels = rs.randint(0, 4, (40,)).astype(np.int64)  # classes 4,5 absent

    want = refm.mean_per_class_accuracy(torch.from_numpy(logits),
                                        torch.from_numpy(labels), 6)
    got = mean_per_class_accuracy(jnp.asarray(logits), labels, 6)
    assert got == pytest.approx(float(want), abs=1e-5)
    # sanity: the absent classes really do dilute the mean
    present_only = np.mean([
        (np.argmax(logits[labels == c], -1) == c).mean() for c in range(4)])
    assert got == pytest.approx(present_only * 100.0 * 4 / 6, abs=1e-5)
