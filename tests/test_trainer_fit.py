"""Trainer.fit end-to-end on synthetic data: one epoch of training plus the
validation/metric path (pose decode, meter conversion, CSV output)."""

import os

import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from tests.test_trainer_resume import SyntheticDataset, make_loader


@pytest.mark.slow
def test_fit_one_epoch_with_validation(tmp_path):
    from ccvpe_tpu.train.trainer import Trainer

    model_cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(batch_size=8, epochs=1, log_every=1)
    workdir = str(tmp_path / "run")
    trainer = Trainer(model_cfg, train_cfg, workdir=workdir)
    trainer.fit(make_loader(model_cfg, 8), make_loader(model_cfg, 8),
                meters_per_pixel=lambda c: 0.1)

    # checkpoint written
    assert trainer.ckpt.latest_step() == 2  # 16 samples / batch 8
    # metrics CSV + JSONL written with val rows
    csv_path = os.path.join(workdir, "tiny.csv")
    assert os.path.exists(csv_path)
    jsonl = open(os.path.join(workdir, "tiny.jsonl")).read()
    assert "val/median_distance_m" in jsonl

    summary = trainer.validate(make_loader(model_cfg, 8)(0),
                               lambda c: 0.1, epoch=0)
    assert np.isfinite(summary["median_distance_m"])
    assert np.isfinite(summary["median_ori_deg"])
    # recalls are part of every validation row (train_KITTI.py:358-360)
    assert "lat_recall@1" in summary and "ori_recall@1deg" in summary


@pytest.mark.slow
def test_dual_eval_sets_per_epoch(tmp_path):
    """KITTI protocol: test1 AND test2 evaluated every epoch, both rows with
    long/lat + orientation recalls (reference train_KITTI.py:168-279)."""
    from ccvpe_tpu.train.trainer import Trainer

    model_cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(batch_size=8, epochs=1, log_every=10)
    workdir = str(tmp_path / "run")
    trainer = Trainer(model_cfg, train_cfg, workdir=workdir)
    trainer.fit(
        make_loader(model_cfg, 8),
        lambda epoch: {"test1": make_loader(model_cfg, 8)(epoch),
                       "test2": make_loader(model_cfg, 8)(epoch)},
        meters_per_pixel=lambda c: 0.1)

    jsonl = open(os.path.join(workdir, "tiny.jsonl")).read()
    for s in ("test1", "test2"):
        for metric in ("median_distance_m", "long_recall@1", "long_recall@3",
                       "long_recall@5", "lat_recall@1", "ori_recall@1deg",
                       "ori_recall@5deg"):
            assert f"{s}/{metric}" in jsonl, (s, metric)
