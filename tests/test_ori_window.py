"""Train-time ori-decoder windowing (ModelConfig.ori_window) is EXACT: the
sigma-4 Gaussian loss weight underflows to 0.0f beyond ~58 px, and the window
keeps Gaussian support + conv receptive field + crop snap inside it, so the
training losses and gradients must equal the full-field ones bit-for-bit-ish
(only summation-order noise on exact zeros = none)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.train.step import Batch, create_train_state, make_loss_fn


def _batch(rng, model_cfg, b=2, edge_case=False):
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    if edge_case:
        # GT near the image corner: the window clamps to the border, where
        # crop-edge zero padding coincides with the true image padding
        row = np.full(b, -(hs / 2 - 6), np.float32)
        col = np.full(b, (ws / 2 - 6), np.float32)
    else:
        row = rng.uniform(-40, 40, b).astype(np.float32)
        col = rng.uniform(-40, 40, b).astype(np.float32)
    return Batch(
        grd=jnp.asarray(rng.normal(size=(b, hg, wg, 3)).astype(np.float32)),
        sat=jnp.asarray(rng.normal(size=(b, hs, ws, 3)).astype(np.float32)),
        row_offset=jnp.asarray(row),
        col_offset=jnp.asarray(col),
        angle_deg=jnp.asarray(rng.uniform(0, 360, b).astype(np.float32)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("edge_case", [False, True])
def test_windowed_losses_and_grads_match_full(edge_case):
    rng = np.random.default_rng(3)
    base = cfg_lib.tiny(sat=256)          # 256^2 aerial -> window 160 fits
    windowed = dataclasses.replace(base, ori_window=160)

    model, state, _ = create_train_state(base, cfg_lib.TrainConfig(),
                                         jax.random.PRNGKey(17))
    batch = _batch(rng, base, edge_case=edge_case)
    key = jax.random.PRNGKey(5)

    def losses_and_grads(cfg):
        loss_fn = make_loss_fn(model.clone(config=cfg), cfg,
                               cfg_lib.TrainConfig())
        (total, (_, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   key)
        return total, metrics, grads

    t_full, m_full, g_full = jax.jit(
        lambda: losses_and_grads(base))()
    t_win, m_win, g_win = jax.jit(
        lambda: losses_and_grads(windowed))()

    assert np.allclose(float(t_full), float(t_win), rtol=1e-6), (
        float(t_full), float(t_win))
    np.testing.assert_allclose(float(m_full["loss_ori"]),
                               float(m_win["loss_ori"]), rtol=1e-6)
    # gradients: every parameter tensor matches (ori decoder included).
    # Tolerance: the windowing is mathematically exact (with weight_ori=0
    # the two graphs produce BIT-IDENTICAL grads, and the direct ori-decoder
    # grads match at ~4e-7 relative), but encoder-side sums accumulate f32
    # terms of ~1e-1..1e2 in different reduction trees; near-cancelled
    # results (e.g. deep BN biases at ~1e-4) carry ~1e-4 ABSOLUTE noise. A
    # real windowing bug would show O(grad-magnitude) errors, far above the
    # 1e-2 absolute floor (grad magnitudes here are ~1e2..1e3).
    flat_f = jax.tree_util.tree_leaves_with_path(g_full)
    flat_w = jax.tree_util.tree_leaves_with_path(g_win)
    for (pf, gf), (pw, gw) in zip(flat_f, flat_w):
        assert pf == pw
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gf), atol=1e-2, rtol=3e-4,
            err_msg=jax.tree_util.keystr(pf))


def test_gaussian_window_equals_sliced_full():
    from ccvpe_tpu.ops.gt import gaussian_heatmap, gaussian_heatmap_window

    rng = np.random.default_rng(0)
    b, h, w, win = 3, 128, 128, 48
    row = jnp.asarray(rng.uniform(-30, 30, b).astype(np.float32))
    col = jnp.asarray(rng.uniform(-30, 30, b).astype(np.float32))
    r0 = jnp.asarray(rng.integers(0, h - win, b), jnp.int32)
    c0 = jnp.asarray(rng.integers(0, w - win, b), jnp.int32)
    full = np.asarray(gaussian_heatmap(h, w, row, col))
    windowed = np.asarray(gaussian_heatmap_window(h, w, win, r0, c0, row, col))
    for i in range(b):
        np.testing.assert_array_equal(
            windowed[i], full[i, int(r0[i]):int(r0[i]) + win,
                              int(c0[i]):int(c0[i]) + win])
