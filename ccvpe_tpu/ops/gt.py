"""On-device ground-truth rendering from (offset, angle) scalars.

The reference renders Gaussian heatmaps and K-channel orientation-binned GTs
per sample on the host with numpy (reference datasets.py:145-166 VIGOR,
:326-351 Oxford, :471-501 KITTI) - its real input-pipeline bottleneck. Here
the host ships three scalars per sample (row_offset, col_offset,
orientation_angle) and everything is rendered on-device inside the jitted
step: pure elementwise math, fused by XLA, negligible cost.

Bin-index semantics differ per dataset and are must-replicate
(SURVEY.md 2.3.9):
  VIGOR  (datasets.py:153-162): REVERSED order - angle is counter-clockwise;
         index 0 -> (ch0, ch K-1), index i>0 -> (ch K-i, ch K-i-1).
  Oxford (datasets.py:339-347): forward order, wrap at K-1.
  KITTI  (datasets.py:489-498): reversed, 16 bins of 22.5 deg.

All outputs NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SIGMA = 4.0  # Gaussian sigma in pixels (datasets.py:149)


def gaussian_heatmap(
    height: int, width: int,
    row_offset: jnp.ndarray, col_offset: jnp.ndarray,
    sigma: float = SIGMA,
) -> jnp.ndarray:
    """exp(-d^2 / 2 sigma^2) around (center - row_offset, center + col_offset).

    Matches datasets.py:147-151 exactly, including the inclusive-endpoint
    linspace grid (step = width/(width-1)) and the sign convention
    (x = -w/2 + col .. w/2 + col, y = -h/2 - row .. h/2 - row).
    Offsets are per-sample scalars [B]. Returns [B, H, W, 1].
    """
    xs = jnp.linspace(-width / 2.0, width / 2.0, width)
    ys = jnp.linspace(-height / 2.0, height / 2.0, height)
    x = xs[None, None, :] + col_offset[:, None, None]
    y = ys[None, :, None] - row_offset[:, None, None]
    d2 = x * x + y * y
    return jnp.exp(-d2 / (2.0 * sigma * sigma))[..., None]


def gaussian_heatmap_window(
    height: int, width: int, win: int,
    row0: jnp.ndarray, col0: jnp.ndarray,
    row_offset: jnp.ndarray, col_offset: jnp.ndarray,
    sigma: float = SIGMA,
) -> jnp.ndarray:
    """The same Gaussian as gaussian_heatmap, restricted to a per-sample
    [row0:row0+win, col0:col0+win] window: bit-identical to slicing the full
    map (same inclusive-endpoint linspace coordinates, just gathered).
    row0/col0 [B] int32. Returns [B, win, win, 1]."""
    xs = jnp.linspace(-width / 2.0, width / 2.0, width)
    ys = jnp.linspace(-height / 2.0, height / 2.0, height)
    xs_w = jax.vmap(lambda c: jax.lax.dynamic_slice(xs, (c,), (win,)))(col0)
    ys_w = jax.vmap(lambda r: jax.lax.dynamic_slice(ys, (r,), (win,)))(row0)
    x = xs_w[:, None, :] + col_offset[:, None, None]
    y = ys_w[:, :, None] - row_offset[:, None, None]
    d2 = x * x + y * y
    return jnp.exp(-d2 / (2.0 * sigma * sigma))[..., None]


def orientation_bin_weights(
    angle_deg: jnp.ndarray, num_bins: int, reversed_order: bool
) -> jnp.ndarray:
    """Per-sample K-vector of (1-ratio, ratio) weights on the two adjacent
    orientation bins. angle_deg [B] in [0, 360). Returns [B, K]."""
    bin_deg = 360.0 / num_bins
    index = jnp.floor(angle_deg / bin_deg).astype(jnp.int32)
    ratio = (angle_deg % bin_deg) / bin_deg
    if reversed_order:
        i0 = jnp.where(index == 0, 0, num_bins - index)
        i1 = jnp.where(index == 0, num_bins - 1, num_bins - index - 1)
    else:
        i0 = index
        i1 = jnp.mod(index + 1, num_bins)
    oh0 = jax.nn.one_hot(i0, num_bins)
    oh1 = jax.nn.one_hot(i1, num_bins)
    return oh0 * (1.0 - ratio)[:, None] + oh1 * ratio[:, None]


def render_gt(
    height: int, width: int, num_bins: int,
    row_offset: jnp.ndarray, col_offset: jnp.ndarray,
    angle_deg: jnp.ndarray, reversed_order: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full GT bundle: (gt [B,H,W,1], gt_with_ori [B,H,W,K], ori [B,H,W,2])."""
    gt = gaussian_heatmap(height, width, row_offset, col_offset)
    w = orientation_bin_weights(angle_deg, num_bins, reversed_order)
    gt_with_ori = gt * w[:, None, None, :]
    rad = angle_deg * (jnp.pi / 180.0)
    ori = jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)
    ori = jnp.broadcast_to(ori[:, None, None, :], (angle_deg.shape[0], height, width, 2))
    return gt, gt_with_ori, ori


def maxpool_pyramid(x: jnp.ndarray, factors) -> Tuple[jnp.ndarray, ...]:
    """Non-overlapping max-pool of NHWC x by each integer factor
    (gt pyramid for the per-scale infoNCE, train_VIGOR.py:123-128)."""
    b, h, w, c = x.shape
    out = []
    for f in factors:
        out.append(
            x.reshape(b, h // f, f, w // f, f, c).max(axis=(2, 4))
        )
    return tuple(out)
