"""KITTI training / evaluation driver (reference train_KITTI.py, TPU-native)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="KITTI dataset root")
    p.add_argument("--train_file", required=False)
    p.add_argument("--test1_file", required=False)
    p.add_argument("--test2_file", required=False)
    p.add_argument("--training", default="True", choices=["True", "False"])
    p.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (lax.scan)")
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("--shift_range_lat", type=float, default=20)
    p.add_argument("--shift_range_lon", type=float, default=20)
    p.add_argument("--rotation_range", type=float, default=180)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--workdir", default="runs/kitti")
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
    from ccvpe_tpu.data.kitti import KittiDataset
    from ccvpe_tpu.data.loader import ThreadedLoader

    if args.training == "True":
        from ccvpe_tpu.train.trainer import Trainer
        model_cfg = cfg_lib.kitti()
        train_cfg = cfg_lib.TrainConfig(
            learning_rate=args.learning_rate, batch_size=args.batch_size,
            grad_accum_steps=args.grad_accum,
            epochs=args.epochs, weight_ori=args.weight_ori,
            weight_infonce=args.weight_infoNCE,
        pretrained_backbone=args.pretrained_backbone,
        warm_start=args.warm_start)
        train_set = KittiDataset(args.root, args.train_file, train=True,
                                 shift_range_lat=args.shift_range_lat,
                                 shift_range_lon=args.shift_range_lon,
                                 rotation_range=args.rotation_range,
                                 image_dtype=args.image_dtype)
        # the reference evaluates test1 (same traversals) AND test2
        # (held-out) every epoch (train_KITTI.py:168-279)
        eval_sets = {}
        for name, file in (("test1", args.test1_file),
                           ("test2", args.test2_file)):
            if file:
                eval_sets[name] = KittiDataset(
                    args.root, file, train=False,
                    shift_range_lat=args.shift_range_lat,
                    shift_range_lon=args.shift_range_lon,
                    rotation_range=args.rotation_range)
        trainer = Trainer(model_cfg, train_cfg, workdir=args.workdir)
        trainer.fit(
            train_loader_fn=lambda epoch: ThreadedLoader(
                train_set, local_bs, shuffle=True, seed=epoch,
                num_workers=args.num_workers,
                shard_id=shard_id, num_shards=num_shards),
            val_loader_fn=lambda epoch: {
                name: ThreadedLoader(ds, local_bs, shuffle=False,
                                     num_workers=args.num_workers,
                                     shard_id=shard_id, num_shards=num_shards)
                for name, ds in eval_sets.items()},
            meters_per_pixel=train_set.meters_per_pixel,
        )
    else:
        from ccvpe_tpu.train.evaluate import evaluate_kitti
        evaluate_kitti(args)


if __name__ == "__main__":
    main()
