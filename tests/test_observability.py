"""Observability subsystem tests: loss logger artifacts, profiler trace."""

import os

import numpy as np
import pytest

from multimodal_segmentation_tpu.utils.observability import (
    LossLogger,
    save_image_grid,
)


class TestLossLogger:
    def test_csv_and_plots(self, tmp_path):
        lg = LossLogger(str(tmp_path))
        lg.on_epoch_end(0, {"loss": 1.0, "dis_M": 0.5, "adv_M": 0.4})
        lg.on_epoch_end(1, {"loss": 0.8, "dis_M": 0.6, "adv_M": 0.3})
        csv = open(tmp_path / "training.csv").read().strip().splitlines()
        assert csv[0] == "epoch,adv_M,dis_M,loss"
        assert len(csv) == 3
        assert os.path.exists(tmp_path / "training_loss.png")
        assert os.path.exists(tmp_path / "training_discr_loss.png")

    def test_image_grid(self, tmp_path):
        rows = [[np.random.rand(8, 8) for _ in range(3)] for _ in range(2)]
        p = str(tmp_path / "grid.png")
        save_image_grid(p, rows)
        assert os.path.exists(p)


@pytest.mark.slow
class TestProfilerTrace:
    def test_profile_epochs_writes_trace(self, tmp_path):
        from multimodal_segmentation_tpu.config import tiny_test_config
        from multimodal_segmentation_tpu.models import build_model
        from multimodal_segmentation_tpu.train.executor import make_executor

        conf = tiny_test_config("mmsdnet")
        conf.dataset_name = "synthetic"
        conf.test_dataset = "synthetic"
        conf.epochs = 1
        conf.steps_per_epoch = 1
        conf.profile_epochs = (0, 1)
        conf.folder = str(tmp_path / "prof")
        ex = make_executor(conf, build_model(conf))
        ex.train()
        trace_dir = os.path.join(conf.folder, "profile")
        assert os.path.isdir(trace_dir)
        # a plugins/profile/<ts>/*.trace.json.gz (or xplane) should exist
        found = []
        for root, _, files in os.walk(trace_dir):
            found += files
        assert found, "no trace files written"


def test_early_stopping_replay_csv(tmp_path):
    """Preemption-resume rebuilds best/wait from training.csv so patience
    does not restart at the resume epoch (round-3 kill+resume drill)."""
    from multimodal_segmentation_tpu.train.early_stopping import EarlyStopping

    p = tmp_path / "training.csv"
    rows = ["epoch,val_loss_mod2_fused"]
    # improves until epoch 2, then plateaus through epoch 9
    vals = [0.9, 0.5, 0.1] + [0.1] * 7
    for e, v in enumerate(vals):
        rows.append("%d,%f" % (e, v))
    p.write_text("\n".join(rows) + "\n")

    es = EarlyStopping(min_delta=0.01, patience=10)
    es.replay_csv(str(p), before_epoch=10)
    assert es.best == 0.1
    assert es.wait == 7  # epochs 3..9 without improvement

    fresh = EarlyStopping(min_delta=0.01, patience=10)
    fresh.replay_csv(str(p), before_epoch=0)  # nothing logged before epoch 0
    assert fresh.wait == 0 and fresh.best == float("inf")


def test_early_stopping_replay_dedupes_rerun_epochs(tmp_path):
    """training.csv is append-only and the row is written before the
    checkpoint save, so a kill+resume re-runs logged epochs and appends
    duplicate rows. Replay must dedupe by epoch (last occurrence wins) or
    each duplicate inflates `wait` and early stop fires early."""
    from multimodal_segmentation_tpu.train.early_stopping import EarlyStopping

    p = tmp_path / "training.csv"
    rows = ["epoch,val_loss_mod2_fused"]
    # first run: epochs 0..5 (improve at 0..2, plateau 3..5), killed after
    # logging epoch 5 but before the checkpoint save of epoch 4..5
    for e, v in enumerate([0.9, 0.5, 0.1, 0.1, 0.1, 0.1]):
        rows.append("%d,%f" % (e, v))
    # resume re-runs epochs 4..5 (slightly different values) then continues
    rows.append("4,0.100000")
    rows.append("5,0.099000")
    rows.append("6,0.098000")
    p.write_text("\n".join(rows) + "\n")

    es = EarlyStopping(min_delta=0.01, patience=10)
    es.replay_csv(str(p), before_epoch=7)
    assert es.best == 0.1
    # epochs 3,4,5,6 without >min_delta improvement — the duplicated 4,5
    # rows must NOT be double-counted (naive replay would give wait=6)
    assert es.wait == 4
