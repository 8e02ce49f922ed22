"""Multi-view merge tests (reference engine_finetune.py merge/compute_video)."""

import numpy as np

from dynamic_tuning_tpu.utils.multiview import (merge_view_outputs,
                                                save_view_outputs)


def test_merge_across_ranks_and_views(tmp_path):
    rs = np.random.RandomState(0)
    # 6 clips, 3 views each, spread over 2 ranks; logits favor the true label
    n_clips, n_views, n_cls = 6, 3, 10
    labels = rs.randint(0, n_cls, n_clips)
    for rank in range(2):
        ids, logits, labs = [], [], []
        for c in range(rank, n_clips, 2):
            for _ in range(n_views):
                ids.append(c)
                row = rs.randn(n_cls) * 0.1
                row[labels[c]] += 2.0
                logits.append(row)
                labs.append(labels[c])
        save_view_outputs(str(tmp_path), rank, np.asarray(ids),
                          np.asarray(logits), np.asarray(labs))
    out = merge_view_outputs(str(tmp_path))
    assert out["num_clips"] == n_clips
    assert out["acc1"] == 100.0


def test_merge_view_averaging_beats_single_view(tmp_path):
    # 1 clip whose first view is wrong but the 3-view average is right
    ids = np.array([0, 0, 0])
    logits = np.array([[3.0, 0.0],
                       [0.0, 4.0],
                       [0.0, 4.0]])
    labels = np.array([1, 1, 1])
    save_view_outputs(str(tmp_path), 0, ids, logits, labels)
    out = merge_view_outputs(str(tmp_path))
    assert out["acc1"] == 100.0


def test_save_appends(tmp_path):
    save_view_outputs(str(tmp_path), 0, np.array([0]), np.zeros((1, 4)),
                      np.array([2]))
    save_view_outputs(str(tmp_path), 0, np.array([1]), np.zeros((1, 4)),
                      np.array([3]))
    out = merge_view_outputs(str(tmp_path))
    assert out["num_clips"] == 2
