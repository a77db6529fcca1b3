"""Pose decoding semantics vs. the reference eval protocol
(reference train_VIGOR.py:187-217, train_KITTI.py:320-327)."""

import math

import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.ops import pose
from ccvpe_tpu.ops.gt import gaussian_heatmap


def ref_angle(cos_v, sin_v):
    """Transcription of train_VIGOR.py:203-217."""
    a = math.acos(max(-1.0, min(1.0, cos_v)))
    if sin_v < 0:
        return math.degrees(-a) % 360
    return math.degrees(a)


def test_decode_angle_roundtrip():
    for deg in [0, 10, 89.9, 90, 179.5, 180, 270, 359]:
        r = math.radians(deg)
        got = float(pose.decode_angle(jnp.array([math.cos(r)]),
                                      jnp.array([math.sin(r)]))[0])
        ref = ref_angle(math.cos(r), math.sin(r))
        assert abs(got - ref) < 1e-3, (deg, got, ref)
        err = min(abs(got - deg), 360 - abs(got - deg))
        assert err < 1e-3


def test_decode_pose_argmax():
    hm = np.zeros((2, 16, 16, 1), np.float32)
    hm[0, 3, 7, 0] = 1.0
    hm[1, 12, 2, 0] = 1.0
    ori = np.zeros((2, 16, 16, 2), np.float32)
    ori[0, 3, 7] = [0.0, 1.0]    # 90 degrees
    ori[1, 12, 2] = [1.0, 0.0]   # 0 degrees
    rows, cols, ang = pose.decode_pose(jnp.asarray(hm), jnp.asarray(ori))
    assert list(np.asarray(rows)) == [3, 12]
    assert list(np.asarray(cols)) == [7, 2]
    np.testing.assert_allclose(np.asarray(ang), [90.0, 0.0], atol=1e-4)


def test_gt_location_matches_rendered_argmax():
    """Analytic GT location == argmax of the rendered Gaussian (the reference
    computes the latter, train_VIGOR.py:189)."""
    rng = np.random.default_rng(3)
    rows_off = rng.uniform(-200, 200, 16).astype(np.float32)
    cols_off = rng.uniform(-200, 200, 16).astype(np.float32)
    gt = np.asarray(gaussian_heatmap(512, 512, jnp.asarray(rows_off),
                                     jnp.asarray(cols_off)))
    rows_a, cols_a = pose.gt_location(512, 512, rows_off, cols_off)
    for b in range(16):
        r, c = np.unravel_index(gt[b, :, :, 0].argmax(), (512, 512))
        assert (r, c) == (rows_a[b], cols_a[b]), b


def test_angle_error_wraps():
    np.testing.assert_allclose(
        pose.angle_error(np.array([359.0, 1.0, 180.0]),
                         np.array([1.0, 359.0, 0.0])),
        [2.0, 2.0, 180.0])


def test_longitudinal_lateral_decomposition():
    # error along heading: all longitudinal
    lo, la = pose.longitudinal_lateral(
        np.array([10]), np.array([0]), np.array([0]), np.array([0]),
        heading_deg=np.array([0.0]), meters_per_pixel=1.0)
    np.testing.assert_allclose(lo, [10.0], atol=1e-6)
    np.testing.assert_allclose(la, [0.0], atol=1e-6)


def test_recalls():
    errs = np.array([0.5, 2.0, 4.0, 10.0])
    r = pose.recalls(errs)
    assert r["recall@1"] == 0.25 and r["recall@3"] == 0.5 and r["recall@5"] == 0.75
