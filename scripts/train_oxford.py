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
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (lax.scan)")
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--workdir", default="runs/oxford")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--pretrained_backbone", default=None,
                   help="ImageNet EfficientNet-B0 weights (.pt/.pth/.npz) to "
                        "fill both encoders before training (the reference's "
                        "default init, models.py:55,99)")
    p.add_argument("--warm_start", default=None,
                   help="full reference CVM .pt state dict to start from")
    p.add_argument("--image_dtype", default="uint8",
                   choices=["float32", "uint8"],
                   help="uint8 ships raw pixels and normalizes on device")
    from ccvpe_tpu.core.mesh import add_distributed_flags, setup_distributed
    add_distributed_flags(p)
    args = p.parse_args()
    shard_id, num_shards = setup_distributed(args)
    assert args.batch_size % num_shards == 0 and args.batch_size >= num_shards, (
        f"global batch {args.batch_size} must be divisible by num_shards "
        f"{num_shards} (otherwise the actual global batch silently shrinks "
        f"and may stop dividing the mesh data axis)")
    local_bs = args.batch_size // num_shards

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.data.loader import ThreadedLoader
    from ccvpe_tpu.data.oxford import OxfordDataset

    model_cfg = cfg_lib.oxford()
    if args.training == "True":
        from ccvpe_tpu.train.trainer import Trainer
        train_cfg = cfg_lib.TrainConfig(
            learning_rate=args.learning_rate, batch_size=args.batch_size,
            grad_accum_steps=args.grad_accum,
            epochs=args.epochs, weight_ori=args.weight_ori,
            weight_infonce=args.weight_infoNCE,
        pretrained_backbone=args.pretrained_backbone,
        warm_start=args.warm_start)
        train_set = OxfordDataset(args.grd_root, args.sat_path, split="train",
                                  image_dtype=args.image_dtype)
        val_set = OxfordDataset(args.grd_root, args.sat_path, split="val",
                                image_dtype=args.image_dtype)
        trainer = Trainer(model_cfg, train_cfg, workdir=args.workdir)
        trainer.fit(
            train_loader_fn=lambda epoch: ThreadedLoader(
                train_set, local_bs, shuffle=True, seed=epoch,
                num_workers=args.num_workers,
                shard_id=shard_id, num_shards=num_shards),
            val_loader_fn=lambda epoch: ThreadedLoader(
                val_set, local_bs, shuffle=False,
                num_workers=args.num_workers,
                shard_id=shard_id, num_shards=num_shards),
            meters_per_pixel=train_set.meters_per_pixel,
        )
    else:
        # sequential per-frame streaming eval over the 3 test traversals
        # (train_OxfordRobotCar.py:195-397), long/lat decomposition included
        from ccvpe_tpu.train.evaluate import _load_params
        from ccvpe_tpu.train.stream import stream_eval

        dataset = OxfordDataset(args.grd_root, args.sat_path, split="test")
        model, params, batch_stats = _load_params(model_cfg, args.checkpoint)
        mpp = dataset.meters_per_pixel()

        bounds = np.cumsum((0,) + dataset.traversal_lens)
        for t in range(3):
            summary = stream_eval(
                model, model_cfg, params, batch_stats, dataset,
                indices=range(bounds[t], bounds[t + 1]),
                batch_size=local_bs, meters_per_pixel=mpp,
                num_workers=args.num_workers,
                shard_id=shard_id, num_shards=num_shards)
            fps = summary.pop("fps")
            if shard_id == 0:
                print(f"traversal {t + 1}: {summary} "
                      f"stream rate {fps:.1f} FPS/host")


if __name__ == "__main__":
    main()
