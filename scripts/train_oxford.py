"""Oxford RobotCar training / streaming-evaluation driver
(reference train_OxfordRobotCar.py, TPU-native)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grd_root", required=True, help="ground image root")
    p.add_argument("--sat_path", required=True, help="stitched aerial map path")
    p.add_argument("--training", default="True", choices=["True", "False"])
    p.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--workdir", default="runs/oxford")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.data.loader import ThreadedLoader
    from ccvpe_tpu.data.oxford import OxfordDataset

    model_cfg = cfg_lib.oxford()
    if args.training == "True":
        from ccvpe_tpu.train.trainer import Trainer
        train_cfg = cfg_lib.TrainConfig(
            learning_rate=args.learning_rate, batch_size=args.batch_size,
            epochs=args.epochs, weight_ori=args.weight_ori,
            weight_infonce=args.weight_infoNCE)
        train_set = OxfordDataset(args.grd_root, args.sat_path, split="train")
        val_set = OxfordDataset(args.grd_root, args.sat_path, split="val")
        trainer = Trainer(model_cfg, train_cfg, workdir=args.workdir)
        trainer.fit(
            train_loader_fn=lambda epoch: ThreadedLoader(
                train_set, args.batch_size, shuffle=True, seed=epoch,
                num_workers=args.num_workers),
            val_loader_fn=lambda epoch: ThreadedLoader(
                val_set, args.batch_size, shuffle=False,
                num_workers=args.num_workers),
            meters_per_pixel=train_set.meters_per_pixel,
        )
    else:
        # sequential per-frame streaming eval over the 3 test traversals
        # (train_OxfordRobotCar.py:195-397), long/lat decomposition included
        import jax
        from ccvpe_tpu.ops import pose
        from ccvpe_tpu.train.evaluate import _load_params
        from ccvpe_tpu.train.step import make_eval_step

        dataset = OxfordDataset(args.grd_root, args.sat_path, split="test")
        model, params, batch_stats = _load_params(model_cfg, args.checkpoint)
        eval_step = make_eval_step(model, model_cfg)
        hs, ws = model_cfg.sat_size
        mpp = dataset.meters_per_pixel()

        bounds = np.cumsum((0,) + dataset.traversal_lens)
        for t in range(3):
            idx = list(range(bounds[t], bounds[t + 1]))
            loader = ThreadedLoader(dataset, args.batch_size, shuffle=False,
                                    num_workers=args.num_workers,
                                    indices=idx, drop_last=False)
            dist, ori_err, longi, lat = [], [], [], []
            import time
            t0 = time.time()
            n = 0
            for raw in loader:
                heatmap, ori = eval_step(params, batch_stats, raw["grd"], raw["sat"])
                rows, cols, angle_pred = map(np.asarray,
                                             pose.decode_pose(heatmap, ori))
                gt_rows, gt_cols = pose.gt_location(
                    hs, ws, raw["row_offset"], raw["col_offset"])
                px = np.sqrt((gt_rows - rows) ** 2 + (gt_cols - cols) ** 2)
                dist.extend((px * mpp).tolist())
                # long/lat decomposition vs. the GT orientation angle
                # (train_OxfordRobotCar.py:248-266)
                lo, la = pose.longitudinal_lateral(
                    rows, cols, gt_rows, gt_cols, raw["angle_deg"], mpp)
                longi.extend(lo.tolist())
                lat.extend(la.tolist())
                ori_err.extend(
                    pose.angle_error(angle_pred, raw["angle_deg"]).tolist())
                n += len(rows)
            fps = n / (time.time() - t0)
            summary = pose.summarize(np.array(dist), np.array(ori_err))
            summary.update({f"long_{k}": v for k, v in
                            pose.recalls(np.array(longi)).items()})
            summary.update({f"lat_{k}": v for k, v in
                            pose.recalls(np.array(lat)).items()})
            summary.update({k.replace("recall@", "ori_recall@") + "deg": v
                            for k, v in pose.recalls(np.array(ori_err)).items()})
            print(f"traversal {t + 1}: {summary} stream rate {fps:.1f} FPS")


if __name__ == "__main__":
    main()
