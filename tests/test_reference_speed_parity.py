"""Our capacity dispatch vs the reference's OWN speed-test model, executed.

The reference realizes actual token skipping in a dedicated model
(models/model_speed_test.py): a deterministic ``sigmoid > 0.5`` gate, then
``nonzero()`` gather -> MLP on the kept rows -> scatter into zeros
(single_forward B=1, :243-271; batch_forward flattens (n,l,c)->(n*l,c)
first, :274-310).  Dynamic shapes like that don't compile on TPU; our
equivalent is the static capacity-bounded dispatch
(ops/dispatch.py::onehot_dispatch_mlp).

Here the reference file EXECUTES unmodified (tests/timm_shim) and our
dispatch forward is compared against it at full capacity (capacity_ratio
1.0), where capacity semantics and threshold semantics coincide exactly —
pinning that our production serving path reproduces the reference's
serving-model numerics, not just our own mask path.
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train.checkpoint import import_pretrained

from reference_oracle import (load_reference_modules, make_select_config,
                              make_tuning_config, reference_available)
from torch_oracle import make_vit_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")

IMG, PATCH, DIM, DEPTH, HEADS, FFN, CLASSES = 32, 8, 64, 2, 4, 8, 13


def build_reference_speed_model():
    load_reference_modules()  # installs the shim + reference sys.path
    mod = importlib.import_module("models.model_speed_test")
    assert mod.__file__.startswith("/root/reference")
    return mod.VisionTransformer(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, num_classes=CLASSES, drop_path_rate=0.0,
        tuning_config=make_tuning_config(FFN, DIM),
        select_config=make_select_config())


@pytest.fixture(scope="module")
def sides():
    rs = np.random.RandomState(5)
    sd = make_vit_state_dict(rs, depth=DEPTH, dim=DIM, ffn=FFN,
                             classes=CLASSES, img=IMG, patch=PATCH)
    ref = build_reference_speed_model()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    # the speed model may register eval-only buffers but must take every
    # weight; anything missing would silently run on random params
    assert not [m for m in missing if "weight" in m or "bias" in m], missing
    ref.eval()

    # capacity_ratio=1.0: capacity == sequence length, so the top-k +
    # threshold-mask dispatch degenerates to exactly the reference's
    # sigmoid>0.5 gather — the regime where the two must agree bit-for-bit
    # on the gate decisions
    model = VisionTransformer(
        ModelConfig(img_size=IMG, patch_size=PATCH, embed_dim=DIM,
                    depth=DEPTH, num_heads=HEADS, num_classes=CLASSES),
        tuning=TuningConfig(ffn_num=FFN, d_model=DIM),
        select=SelectConfig(capacity_ratio=1.0), dtype=jnp.float32)
    p = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, IMG, IMG, 3), jnp.float32))["params"]
    p, miss = import_pretrained(p, sd)
    assert miss == []
    return ref, model, p, rs


@pytest.mark.parametrize("batch", [1, 6])  # 1 -> single_forward (gather by
def test_dispatch_matches_reference_speed_model(sides, batch):
    # token index), >1 -> batch_forward (flattened gather), the two code
    # paths of model_speed_test.py:235-241
    ref, model, p, rs = sides
    x = np.clip(np.random.RandomState(100 + batch).randn(batch, IMG, IMG, 3),
                -2.6, 2.6).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
    want = want.numpy()

    ours, aux = model.apply({"params": p}, jnp.asarray(x), dispatch=True)
    ours = np.asarray(ours, np.float32)
    scale = np.abs(want).max()
    assert np.abs(ours - want).max() <= 2e-5 * max(scale, 1.0), (
        np.abs(ours - want).max(), scale)

    # sanity: the gate is doing real work (some tokens skipped, CLS kept)
    gates = np.asarray(aux["token_select"])[..., 0]
    assert 0.05 < gates.mean() < 0.95
