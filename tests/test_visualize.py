"""Qualitative rendering (utils/viz.py) smoke: writes a PNG from arrays
(reference visualize_qualitative_results_VIGOR.py:120-153 protocol)."""

import os

import numpy as np

from ccvpe_tpu.utils.viz import render_qualitative


def test_render_qualitative_writes_png(tmp_path):
    r = np.random.default_rng(0)
    hs = ws = 128
    heatmap = r.uniform(1e-8, 1.0, size=(hs, ws))
    ang = r.uniform(0, 2 * np.pi, size=(hs, ws))
    ori = np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    out = str(tmp_path / "qual.png")
    path = render_qualitative(
        grd_img=r.uniform(0, 1, size=(64, 128, 3)),
        sat_img=r.uniform(0, 1, size=(hs, ws, 3)),
        heatmap=heatmap, ori=ori,
        gt_rc=(40.0, 50.0), pred_rc=(40, 52),
        out_path=out, angle_deg=123.4, quiver_step=32)
    assert path == out
    assert os.path.getsize(out) > 10_000  # a real rendered image, not a stub
