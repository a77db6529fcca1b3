"""Pose decoding and evaluation metrics.

Reference eval protocol (train_VIGOR.py:187-217, :290-326; decomposition
train_KITTI.py:320-327; recalls train_KITTI.py:358-360):
  location  = argmax of the heatmap; pixel distance to GT argmax -> meters
  angle     = acos(cos_pred) with the sign of sin_pred, mod 360
  ori error = min(|d|, 360 - |d|)
  KITTI/Oxford: longitudinal/lateral decomposition against the heading.

Device part (argmax, angle field sampling) is jittable; aggregation is host
numpy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def decode_pose(heatmap: jnp.ndarray, ori: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[B,H,W,1] heatmap + [B,H,W,2] ori field -> (rows [B], cols [B],
    angle_deg [B]) at the heatmap argmax. Jittable."""
    b, h, w, _ = heatmap.shape
    flat = heatmap.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    rows, cols = idx // w, idx % w
    vec = ori[jnp.arange(b), rows, cols]  # [B, 2]
    angle = decode_angle(vec[:, 0], vec[:, 1])
    return rows, cols, angle


def decode_angle(cos_v: jnp.ndarray, sin_v: jnp.ndarray) -> jnp.ndarray:
    """acos + sin-sign decode, mod 360 (train_VIGOR.py:203-217 semantics)."""
    a = jnp.degrees(jnp.arccos(jnp.clip(cos_v, -1.0, 1.0)))
    return jnp.where(sin_v < 0, (-a) % 360.0, a)


def gt_location_device(height: int, width: int, row_offset: jnp.ndarray,
                       col_offset: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp twin of gt_location (same first-min-on-tie argmin semantics) so
    the scalar-only eval step can compute GT pixels and prob@GT on device
    instead of fetching the full heatmap (train/evaluate.py)."""
    ys = jnp.linspace(-height / 2.0, height / 2.0, height)
    xs = jnp.linspace(-width / 2.0, width / 2.0, width)
    rows = jnp.argmin(jnp.abs(ys[None, :] - row_offset[:, None]), axis=1)
    cols = jnp.argmin(jnp.abs(xs[None, :] + col_offset[:, None]), axis=1)
    return rows, cols


def angle_error(pred_deg: np.ndarray, gt_deg: np.ndarray) -> np.ndarray:
    d = np.abs(pred_deg - gt_deg)
    return np.minimum(d, 360.0 - d)


def gt_location(height: int, width: int, row_offset: np.ndarray,
                col_offset: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Argmax of the GT Gaussian = nearest grid point to the offset center.

    The reference takes argmax of the rendered GT (train_VIGOR.py:189); with
    the inclusive-endpoint linspace grid the max sits at the grid index
    closest to (h/2*(h-2r)/h...) - computed here analytically from the same
    grid definition (datasets.py:147)."""
    ys = np.linspace(-height / 2.0, height / 2.0, height)
    xs = np.linspace(-width / 2.0, width / 2.0, width)
    rows = np.abs(ys[None, :] - row_offset[:, None]).argmin(axis=1)
    cols = np.abs(xs[None, :] + col_offset[:, None]).argmin(axis=1)
    return rows, cols


def longitudinal_lateral(
    pixel_rows: np.ndarray, pixel_cols: np.ndarray,
    gt_rows: np.ndarray, gt_cols: np.ndarray,
    heading_deg: np.ndarray, meters_per_pixel: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Project the error vector onto the vehicle direction
    (train_KITTI.py:320-327): angle_diff = |angle - atan2(|dcol|, |drow|)|;
    long = |cos|*d, lat = |sin|*d. `heading_deg` is the GT ORIENTATION angle
    in degrees from North (the reference's orientation_from_north,
    train_KITTI.py:310), not the raw oxts heading."""
    drow = np.abs(gt_rows - pixel_rows)
    dcol = np.abs(gt_cols - pixel_cols)
    dist = np.sqrt(drow ** 2 + dcol ** 2) * meters_per_pixel
    err_dir = np.degrees(np.arctan2(dcol, drow))
    diff = np.radians(np.abs(heading_deg - err_dir))
    return np.abs(np.cos(diff)) * dist, np.abs(np.sin(diff)) * dist


def summarize(distances: np.ndarray, ori_errors: Optional[np.ndarray] = None,
              prob_at_gt: Optional[np.ndarray] = None) -> Dict[str, float]:
    out = {
        "mean_distance_m": float(np.mean(distances)),
        "median_distance_m": float(np.median(distances)),
    }
    if ori_errors is not None and len(ori_errors):
        out["mean_ori_deg"] = float(np.mean(ori_errors))
        out["median_ori_deg"] = float(np.median(ori_errors))
    if prob_at_gt is not None and len(prob_at_gt):
        out["mean_prob_at_gt"] = float(np.mean(prob_at_gt))
        out["median_prob_at_gt"] = float(np.median(prob_at_gt))
    return out


def recalls(errors_m: np.ndarray, thresholds=(1.0, 3.0, 5.0)) -> Dict[str, float]:
    """Recall@threshold (train_KITTI.py:358-360)."""
    return {f"recall@{t:g}": float(np.mean(errors_m < t)) for t in thresholds}
