"""On-device GT rendering and loss functions vs. the reference numpy/torch
semantics (reference datasets.py:145-166, losses.py:4-29)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.ops.gt import (
    gaussian_heatmap,
    maxpool_pyramid,
    orientation_bin_weights,
    render_gt,
)
from ccvpe_tpu.train.losses import (
    cross_entropy_loss,
    infonce_loss,
    orientation_loss,
)


def ref_gaussian(height, width, row_offset, col_offset, sigma=4.0):
    """Transcription of datasets.py:145-151."""
    x, y = np.meshgrid(
        np.linspace(-width / 2 + col_offset, width / 2 + col_offset, width),
        np.linspace(-height / 2 - row_offset, height / 2 - row_offset, height),
    )
    d = np.sqrt(x * x + y * y)
    return np.exp(-(d ** 2) / (2.0 * sigma ** 2)).astype(np.float32)


def ref_ori_weights(angle, num_bins, reversed_order):
    """Transcription of datasets.py:153-162 (reversed) / :339-347 (forward)."""
    bin_deg = 360.0 / num_bins
    index = int(angle // bin_deg)
    ratio = (angle % bin_deg) / bin_deg
    w = np.zeros(num_bins, np.float32)
    if reversed_order:
        if index == 0:
            w[0], w[num_bins - 1] = 1 - ratio, ratio
        else:
            w[num_bins - index] = 1 - ratio
            w[num_bins - index - 1] = ratio
    else:
        if index == num_bins - 1:
            w[num_bins - 1], w[0] = 1 - ratio, ratio
        else:
            w[index], w[index + 1] = 1 - ratio, ratio
    return w


@pytest.mark.parametrize("row,col", [(0.0, 0.0), (37.0, -81.0), (-200.0, 150.0)])
def test_gaussian_matches_reference(row, col):
    ours = gaussian_heatmap(128, 128, jnp.array([row]), jnp.array([col]))
    ref = ref_gaussian(128, 128, row, col)
    np.testing.assert_allclose(np.asarray(ours[0, :, :, 0]), ref, atol=1e-6)


@pytest.mark.parametrize("num_bins,reversed_order", [(20, True), (20, False), (16, True)])
@pytest.mark.parametrize("angle", [0.0, 9.0, 17.999, 18.0, 90.5, 180.0, 351.0, 359.9])
def test_ori_bin_weights(num_bins, reversed_order, angle):
    ours = orientation_bin_weights(
        jnp.array([angle]), num_bins, reversed_order)[0]
    ref = ref_ori_weights(angle, num_bins, reversed_order)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_render_gt_bundle():
    gt, gt_ori, ori = render_gt(
        64, 64, 20, jnp.array([5.0]), jnp.array([-3.0]), jnp.array([45.0]))
    assert gt.shape == (1, 64, 64, 1)
    assert gt_ori.shape == (1, 64, 64, 20)
    assert ori.shape == (1, 64, 64, 2)
    # channel sum of gt_with_ori equals gt (weights sum to 1)
    np.testing.assert_allclose(
        np.asarray(gt_ori.sum(-1)), np.asarray(gt[..., 0]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ori[0, 0, 0]), [np.cos(np.pi / 4), np.sin(np.pi / 4)], atol=1e-6)


def test_maxpool_pyramid():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32))
    (p2, p8) = maxpool_pyramid(x, (2, 8))
    assert p2.shape == (2, 32, 32, 3) and p8.shape == (2, 8, 8, 3)
    assert float(p2[0, 0, 0, 0]) == float(x[0, :2, :2, 0].max())
    assert float(p8[1, 3, 7, 2]) == float(x[1, 24:32, 56:64, 2].max())


# --- losses vs. reference masked-select semantics ---

def ref_infonce(scores, labels, temperature=0.1):
    """Transcription of losses.py:4-20 with numpy."""
    exp_scores = np.exp(scores / temperature)
    mask = labels > 1e-2
    denom = exp_scores.sum(axis=1, keepdims=True)
    inner = np.log((exp_scores / denom)[mask])
    return -(inner * labels[mask]).sum() / labels[mask].sum()


def test_infonce_matches_reference(rng):
    scores = rng.uniform(-1, 1, size=(4, 20 * 8 * 8)).astype(np.float32)
    labels = (rng.uniform(0, 1, size=(4, 20 * 8 * 8)) ** 8).astype(np.float32)
    ours = float(infonce_loss(jnp.asarray(scores), jnp.asarray(labels)))
    ref = ref_infonce(scores.astype(np.float64), labels.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cross_entropy_matches_reference(rng):
    logits = rng.normal(size=(3, 100)).astype(np.float32)
    labels = rng.uniform(0, 1, size=(3, 100)).astype(np.float32)
    labels /= labels.sum(axis=1, keepdims=True)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    logp = np.log(np.exp(logits.astype(np.float64))
                  / np.exp(logits.astype(np.float64)).sum(1, keepdims=True))
    ref = -(labels * logp).sum() / 3
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_orientation_loss_matches_reference(rng):
    ori = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
    gt_ori = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
    gt = rng.uniform(0, 1, size=(2, 16, 16, 1)).astype(np.float32)
    ours = float(orientation_loss(jnp.asarray(ori), jnp.asarray(gt_ori), jnp.asarray(gt)))
    ref = (((gt_ori - ori) ** 2).sum(-1, keepdims=True) * gt).sum() / 2
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
