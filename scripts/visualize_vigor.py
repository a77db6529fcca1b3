"""Qualitative VIGOR results: heatmap overlay (log scale), GT/pred markers and
a quiver field of predicted orientations (reference
visualize_qualitative_results_VIGOR.py:120-153, TPU-native re-implementation).

Usage:
  python scripts/visualize_vigor.py --root /data/VIGOR --checkpoint ... \
      --index 4 --out qualitative.png
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--area", default="samearea")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--ori_noise", type=float, default=180.0)
    p.add_argument("--out", default="qualitative.png")
    args = p.parse_args()

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from ccvpe_tpu.data.vigor import VIGORDataset
    from ccvpe_tpu.ops import pose
    from ccvpe_tpu.train.evaluate import _load_params
    from ccvpe_tpu.train.step import make_eval_step
    from ccvpe_tpu.utils.viz import render_qualitative

    ori_noise = 18.0 * (args.ori_noise // 18.0)
    dataset = VIGORDataset(args.root, split=args.area, train=False,
                           ori_noise=ori_noise)
    sample = dataset.__getitem__(args.index, rng=random.Random(0))

    model_cfg = cfg_lib.vigor(
        ori_noise=ori_noise if ori_noise < 180 else None)
    model, params, batch_stats = _load_params(model_cfg, args.checkpoint)
    eval_step = make_eval_step(model, model_cfg)
    heatmap, ori = eval_step(params, batch_stats,
                             sample.grd[None], sample.sat[None])
    heatmap = np.asarray(heatmap)[0, :, :, 0]
    ori = np.asarray(ori)[0]

    hs, ws = model_cfg.sat_size
    gt_r, gt_c = pose.gt_location(hs, ws, np.array([sample.row_offset]),
                                  np.array([sample.col_offset]))
    pr, pc = np.unravel_index(heatmap.argmax(), heatmap.shape)

    sat_img = sample.sat * IMAGENET_STD + IMAGENET_MEAN
    sat_img = np.clip(sat_img, 0, 1)
    grd_img = np.clip(sample.grd * IMAGENET_STD + IMAGENET_MEAN, 0, 1)

    render_qualitative(grd_img, sat_img, heatmap, ori,
                       gt_rc=(gt_r[0], gt_c[0]), pred_rc=(pr, pc),
                       out_path=args.out, angle_deg=sample.angle_deg)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
