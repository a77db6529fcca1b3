"""Checkpoint save/restore roundtrip (params + opt_state + step) — the
resume capability the reference lacks (reference train_VIGOR.py:159-163
saves bare state_dicts and always restarts at epoch 0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core.checkpoint import CheckpointManager
from ccvpe_tpu.train.step import TrainState


def make_state(value):
    params = {"dense": {"kernel": np.full((4, 4), value, np.float32),
                        "bias": np.zeros((4,), np.float32)}}
    opt_state = {"mu": {"dense": {"kernel": np.full((4, 4), value / 10, np.float32),
                                  "bias": np.zeros((4,), np.float32)}}}
    return TrainState(np.asarray(7, np.int32), params,
                      {"bn": {"mean": np.ones((4,), np.float32)}}, opt_state)


def test_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    state = make_state(3.5)
    mgr.save(7, state)
    mgr.wait()

    template = make_state(0.0)
    restored, cursor = mgr.restore_latest(template)
    assert cursor == {"epoch": 0, "batch": 0}
    assert int(restored.step) == 7
    np.testing.assert_array_equal(restored.params["dense"]["kernel"],
                                  state.params["dense"]["kernel"])
    np.testing.assert_array_equal(
        restored.opt_state["mu"]["dense"]["kernel"],
        state.opt_state["mu"]["dense"]["kernel"])
    np.testing.assert_array_equal(restored.batch_stats["bn"]["mean"],
                                  state.batch_stats["bn"]["mean"])


def test_retention_keeps_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for step in (1, 2, 3):
        mgr.save(step, make_state(float(step)))
    mgr.wait()
    assert mgr.latest_step() == 3
    restored, _ = mgr.restore_latest(make_state(0.0))
    assert float(restored.params["dense"]["kernel"][0, 0]) == 3.0


def test_restore_empty_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore_latest(make_state(0.0)) is None


def test_cursor_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, make_state(1.0), cursor={"epoch": 2, "batch": 13})
    mgr.wait()
    _, cursor = mgr.restore_latest(make_state(0.0))
    assert cursor == {"epoch": 2, "batch": 13}
