"""Utility-module tests: meters, logger, TSV writer, scan_throughput
(reference misc.py:24-168, util/logger.py)."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_tuning_tpu.utils.logger import TensorBoardWriter, create_logger
from dynamic_tuning_tpu.utils.meters import MetricLogger, SmoothedValue
from dynamic_tuning_tpu.utils.profiling import Timer, scan_throughput


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4, 5]:
        v.update(x)
    assert v.value == 5
    assert v.median == 4          # window = [3, 4, 5]
    assert v.avg == 4
    assert v.global_avg == 3      # all five
    assert "4.0" in str(v)


def test_metric_logger_log_every(caplog):
    logger = logging.getLogger("test_ml")
    logger.setLevel(logging.DEBUG)
    ml = MetricLogger(logger=logger)
    with caplog.at_level(logging.DEBUG, logger="test_ml"):
        for item in ml.log_every(range(7), print_freq=3, header="Ep[0]"):
            ml.update(loss=float(item))
    assert ml.meters["loss"].global_avg == 3.0
    joined = " ".join(r.message for r in caplog.records)
    assert "Ep[0]" in joined and "eta" in joined and "Total time" in joined


def test_tsv_writer(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 10)
    w.add_scalar("lr", 0.01, 10)
    w.close()
    rows = open(os.path.join(str(tmp_path), "scalars.tsv")).read().splitlines()
    assert rows[0].split("\t") == ["loss", "10", "1.5"]


def test_create_logger_writes_rank_file(tmp_path):
    lg = create_logger(str(tmp_path), dist_rank=3, name="ranktest")
    lg.info("hello rank file")
    path = os.path.join(str(tmp_path), "log_rank3.txt")
    assert os.path.exists(path)
    assert "hello rank file" in open(path).read()


def test_timer_and_scan_throughput():
    with Timer() as t:
        _ = sum(range(1000))
    assert t.ms >= 0

    def apply_once(w, x):
        return (x @ w).sum()

    w = jnp.eye(16)
    x = jnp.ones((8, 16))
    ips = scan_throughput(apply_once, (w, x), batch=8, iters=5, repeats=2)
    assert ips > 0


def test_tb_event_writer_roundtrip(tmp_path):
    """TensorBoardWriter emits real events.out.tfevents.* files (reference
    engine_finetune.py:95-101 writes SummaryWriter scalars); framing CRCs
    and proto encoding verified by our reader AND, when the tensorboard
    package is importable, by TensorBoard's own EventAccumulator."""
    from dynamic_tuning_tpu.utils.logger import TensorBoardWriter
    from dynamic_tuning_tpu.utils.tb_writer import read_event_file

    w = TensorBoardWriter(str(tmp_path))
    scalars = [("loss", 2.5, 0), ("loss", 1.25, 1000),
               ("perf/test_acc1", 81.3, 1000)]
    for tag, v, s in scalars:
        w.add_scalar(tag, v, s)
    w.add_scalar("sentinel", 0.0, -1)   # negative step must not hang _varint
    w.close()

    # TSV side
    lines = (tmp_path / "scalars.tsv").read_text().strip().splitlines()
    assert len(lines) == 4 and lines[0].split("\t")[0] == "loss"

    # event-file side, our reader
    evt = [p for p in tmp_path.iterdir()
           if p.name.startswith("events.out.tfevents.")]
    assert len(evt) == 1
    got = list(read_event_file(str(evt[0])))
    assert [(t, round(v, 4), s) for t, v, s in got[:3]] == scalars
    # negative step decodes as 64-bit two's complement (proto int64)
    assert got[3][2] == (1 << 64) - 1

    # cross-check with stock TensorBoard when present
    try:
        from tensorboard.backend.event_processing.event_accumulator import \
            EventAccumulator
    except ImportError:
        return
    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert sorted(acc.Tags()["scalars"]) == ["loss", "perf/test_acc1",
                                             "sentinel"]
    loss = acc.Scalars("loss")
    assert [(e.step, round(e.value, 4)) for e in loss] == [(0, 2.5),
                                                           (1000, 1.25)]
