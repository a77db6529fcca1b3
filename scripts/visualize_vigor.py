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

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from ccvpe_tpu.data.vigor import VIGORDataset
    from ccvpe_tpu.ops import pose
    from ccvpe_tpu.train.evaluate import _load_params
    from ccvpe_tpu.train.step import make_eval_step

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

    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    axes[0].imshow(grd_img)
    axes[0].set_title(f"ground (angle {sample.angle_deg:.1f} deg)")
    axes[0].axis("off")

    axes[1].imshow(sat_img)
    axes[1].imshow(heatmap, norm=LogNorm(vmin=max(heatmap.min(), 1e-10),
                                         vmax=heatmap.max()),
                   alpha=0.6, cmap="Reds")
    # quiver of the predicted orientation field every 40 px
    # (visualize_qualitative_results_VIGOR.py:140-147)
    step = 40
    ys, xs = np.mgrid[step // 2:hs:step, step // 2:ws:step]
    cos_v = ori[ys, xs, 0]
    sin_v = ori[ys, xs, 1]
    # angle 0 = North (up), counter-clockwise positive
    axes[1].quiver(xs, ys, -sin_v, cos_v, color="gold", width=0.003)
    axes[1].scatter([gt_c[0]], [gt_r[0]], marker="*", s=200, c="lime",
                    label="GT")
    axes[1].scatter([pc], [pr], marker="x", s=150, c="cyan", label="pred")
    axes[1].legend()
    axes[1].set_title("heatmap + orientation field")
    axes[1].axis("off")

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
