"""MoE-adapter non-inferiority (VERDICT r3 #5).

The paper's motivating claim (reference README.md:27: the MoE-enhanced
adapter "further improves adaptation") reproduced on the heterogeneous
synthetic task: at EQUAL bottleneck and equal steps, MoE-4 beat the single
adapter in 4/4 seeds of the 600-step A/B (scripts/validate_moe_ab.py,
BENCH.md round-4 table; means 0.688 vs 0.619).  This test pins the paired
seed-0 comparison at a reduced 300-step budget (measured margin +0.063)
with a -0.02 non-inferiority floor, fully deterministic on CPU.

Finding also recorded in BENCH.md: at equal PARAMETER budget the wider
single adapter (b=32) wins on this task (0.727 vs 0.688) — the MoE
advantage is per-bottleneck, not per-parameter, on synthetic hetero data.

Marked fullscale: ~3.5 min of training, budget-class with the torch-oracle
full-shape modules rather than the quick loop.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.fullscale
def test_moe4_non_inferior_to_single_adapter_hetero():
    from validate_moe_ab import run_arm

    kw = dict(classes=20, domains=4, noise=80.0)
    single = run_arm("single_b8", "hetero", 0, 300, **kw)
    moe = run_arm("moe4_b8", "hetero", 0, 300, **kw)
    # paired same-seed/same-data comparison; measured +0.063 at this budget
    assert moe["acc"] >= single["acc"] - 0.02, (
        f"MoE-4 regressed vs single adapter: {moe['acc']:.3f} vs "
        f"{single['acc']:.3f}")
    # both arms must actually have learned (task is well off chance 0.05)
    assert single["acc"] > 0.3 and moe["acc"] > 0.3
