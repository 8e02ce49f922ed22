"""Rehearse scripts/validate_real_ckpt.py end-to-end on a synthetic .pth.

The real ``jx_vit_base_patch16_224_in21k`` weights need an operator (no
egress — OPERATOR.md); this rehearsal proves the one-shot validator works
the day the file lands: a full-shape IN21K-statistics state dict is saved
through ``torch.save`` exactly as timm ships it, and the script must
import it on both sides (reference-executed torch model + our flax import
path), compare complete-model logits, and print ``"pass": true``.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from reference_oracle import reference_available
from torch_oracle import make_vit_state_dict

pytestmark = [pytest.mark.fullscale,
              pytest.mark.skipif(not reference_available(),
                                 reason="/root/reference not present")]


def test_validate_real_ckpt_rehearsal(tmp_path):
    rs = np.random.RandomState(5)
    sd = make_vit_state_dict(rs, depth=12, dim=768, ffn=64, classes=1000,
                             img=224, patch=16)
    # drop the DyT-only params: a released timm checkpoint has none
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
          if "adaptmlp" not in k and "mlp_token_select" not in k}
    ckpt = tmp_path / "VIT_BASE_IN21K.pth"
    torch.save({"model": sd}, ckpt)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # seg at 256 (not the recipe's 512) keeps the rehearsal fast while
    # still exercising the 224->grid pos-embed resize on BOTH sides
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "validate_real_ckpt.py"),
         "--ckpt", str(ckpt), "--batch", "2", "--seg_img", "256"],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["pass"] is True, report
    assert report["argmax_agreement"] == 1.0
    assert report["rel_err"] <= 1e-3
    assert report["torch_missing_ok"] and report["flax_missing_ok"]
    # all three recipes' import of the same image ckpt validate in one shot
    assert report["video"]["pass"] and report["video"]["rel_err"] <= 1e-3
    assert report["seg"]["pass"] and report["seg"]["feat_rel_err"] <= 1e-3
