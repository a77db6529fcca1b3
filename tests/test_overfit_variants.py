"""Per-variant end-to-end learnability (r3 verdict item 7): the KITTI and
Oxford geometry quirks must survive TRAINING, not only golden forwards.

Tiny-geometry configs carry each preset's defining conventions:
  * kitti-like: 16 orientation bins with the level-6 roll-shift REPEAT
    quirk (reference models.py:910: shift 8 reused, the roll wraps early;
    here shift 1 at both finest scales), reversed bin order in the GT
    weights (reference datasets.py:489-498).
  * oxford-like: centre-window matching (reference models.py:1094: the
    window is [D/2-L/2, D/2+L/2) of the rolled map, L < D at every scale)
    and FORWARD GT bin order (reference datasets.py:342-347).

Each must localize a synthetic aerial cue within 100 steps on the CPU mesh.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.train.step import create_train_state, make_eval_step, make_train_step
from tests.test_overfit_localization import learnable_batch


def tiny_kitti() -> cfg_lib.ModelConfig:
    """Tiny config with the KITTI bin plan: K=16 (22.5deg-bin analog),
    bottleneck shift D/K, and the finest shift REPEATED (wraps every
    8 bins at D=8) - the models.py:910 quirk in miniature. name='kitti'
    selects reversed GT bin order (train/step.py::_reversed_bins)."""
    return dataclasses.replace(
        cfg_lib.tiny(), name="kitti", circular=False, num_bins=16,
        roll_shifts=(16, 8, 4, 2, 1, 1))


def tiny_oxford() -> cfg_lib.ModelConfig:
    """Tiny config with Oxford's centre-window matching: descriptor length
    is HALF the channel count at every scale, matched against the centre
    slice of the rolled map (models.py:1094); name='oxford' selects
    forward GT bin order (datasets.py:342-347)."""
    return dataclasses.replace(
        cfg_lib.tiny(), name="oxford", circular=False, center_window=True,
        grd_desc_channels=(32, 16, 8, 4, 2, 1))


@pytest.mark.slow
@pytest.mark.parametrize("make_cfg", [tiny_kitti, tiny_oxford],
                         ids=["kitti", "oxford"])
def test_variant_localizes_synthetic_cue(make_cfg):
    from ccvpe_tpu.ops import pose

    cfg = make_cfg()
    train_cfg = cfg_lib.TrainConfig(batch_size=8, learning_rate=1e-3)
    model, state, tx = create_train_state(cfg, train_cfg,
                                          jax.random.PRNGKey(17))
    step = make_train_step(model, tx, cfg, train_cfg, donate=False)
    eval_step = make_eval_step(model, cfg)
    hs, ws = cfg.sat_size

    def median_err(state, batch):
        import jax.numpy as jnp
        heatmap, _ = eval_step(state.params, state.batch_stats,
                               batch.grd, batch.sat)
        rows, cols, _ = map(np.asarray, pose.decode_pose(
            heatmap, jnp.zeros((batch.grd.shape[0], hs, ws, 2))))
        gt_r, gt_c = pose.gt_location(hs, ws, np.asarray(batch.row_offset),
                                      np.asarray(batch.col_offset))
        return float(np.median(np.hypot(gt_r - rows, gt_c - cols)))

    batch = learnable_batch(cfg, 8, seed=0)
    err0 = median_err(state, batch)
    rng = jax.random.PRNGKey(0)
    for _ in range(100):
        state, m = step(state, batch, rng)
    err1 = median_err(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert err1 < max(6.0, err0 * 0.25), (err0, err1)
