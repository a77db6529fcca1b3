"""E2E learnability smoke (SURVEY.md 4): on a synthetic dataset with a real
visual localization cue (a bright blob at the GT position in the aerial
image), a few dozen train steps must drive the predicted location toward the
ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.ops import pose
from ccvpe_tpu.train.step import (
    Batch,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def learnable_batch(cfg, batch_size, seed):
    """Aerial image contains a bright Gaussian blob at the GT location;
    ground image encodes nothing (loss still trains the loc head)."""
    r = np.random.default_rng(seed)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    row = r.uniform(-hs / 4, hs / 4, batch_size).astype(np.float32)
    col = r.uniform(-ws / 4, ws / 4, batch_size).astype(np.float32)
    angle = r.uniform(0, 360, batch_size).astype(np.float32)
    sat = r.normal(0, 0.3, size=(batch_size, hs, ws, 3)).astype(np.float32)
    ys = np.linspace(-hs / 2, hs / 2, hs)
    xs = np.linspace(-ws / 2, ws / 2, ws)
    for b in range(batch_size):
        d2 = ((ys[:, None] - row[b]) ** 2 + (xs[None, :] + col[b]) ** 2)
        sat[b] += 3.0 * np.exp(-d2 / (2 * 6.0 ** 2))[..., None]
    grd = r.normal(0, 0.3, size=(batch_size, hg, wg, 3)).astype(np.float32)
    return Batch(grd=jnp.asarray(grd), sat=jnp.asarray(sat),
                 row_offset=jnp.asarray(row), col_offset=jnp.asarray(col),
                 angle_deg=jnp.asarray(angle))


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_localization_becomes_learnable(dtype):
    """Runs in both f32 and the benchmark's bf16 mixed-precision mode
    (conv-path activations bf16; params/BN/correlation/losses f32) - the
    bf16 path must remain just as learnable."""
    import dataclasses
    cfg = dataclasses.replace(cfg_lib.tiny(), compute_dtype=dtype)
    train_cfg = cfg_lib.TrainConfig(batch_size=8, learning_rate=1e-3)
    model, state, tx = create_train_state(cfg, train_cfg, jax.random.PRNGKey(17))
    step = make_train_step(model, tx, cfg, train_cfg, donate=False)
    eval_step = make_eval_step(model, cfg)
    hs, ws = cfg.sat_size

    def median_err(state, batch):
        heatmap, _ = eval_step(state.params, state.batch_stats,
                               batch.grd, batch.sat)
        rows, cols, _ = map(np.asarray, pose.decode_pose(heatmap, jnp.zeros(
            (batch.grd.shape[0], hs, ws, 2))))
        gt_r, gt_c = pose.gt_location(hs, ws, np.asarray(batch.row_offset),
                                      np.asarray(batch.col_offset))
        return float(np.median(np.hypot(gt_r - rows, gt_c - cols)))

    batch = learnable_batch(cfg, 8, seed=0)
    err0 = median_err(state, batch)
    rng = jax.random.PRNGKey(0)
    for i in range(50):
        state, m = step(state, batch, rng)
    err1 = median_err(state, batch)
    assert np.isfinite(float(m["loss"]))
    # from random-init (~tens of px on a 128 grid) to near the blob
    assert err1 < max(6.0, err0 * 0.25), (err0, err1)
