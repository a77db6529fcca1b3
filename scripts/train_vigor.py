"""VIGOR training / evaluation driver (reference train_VIGOR.py, TPU-native).

Training:
  python scripts/train_vigor.py --root /data/VIGOR --area samearea
Evaluation with orientation prior and FoV slicing:
  python scripts/train_vigor.py --root /data/VIGOR --training False \
      --ori_noise 72 --FoV 360 --checkpoint runs/vigor/checkpoints
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="VIGOR dataset root")
    p.add_argument("--area", default="samearea", choices=["samearea", "crossarea"])
    p.add_argument("--training", default="True", choices=["True", "False"])
    p.add_argument("--pos_only", default="True", choices=["True", "False"])
    p.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (lax.scan)")
    p.add_argument("--weight_ori", type=float, default=1e1)
    p.add_argument("--weight_infoNCE", type=float, default=1e4)
    p.add_argument("-f", "--FoV", type=int, default=360)
    p.add_argument("--ori_noise", type=float, default=180.0)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--workdir", default="runs/vigor")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (eval) or resume dir (train)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--pretrained_backbone", default=None,
                   help="ImageNet EfficientNet-B0 weights (.pt/.pth/.npz) to "
                        "fill both encoders before training (the reference's "
                        "default init, models.py:55,99)")
    p.add_argument("--warm_start", default=None,
                   help="full reference CVM .pt state dict to start from")
    p.add_argument("--image_dtype", default="uint8",
                   choices=["float32", "uint8"],
                   help="uint8 ships raw pixels and normalizes on device "
                        "(4x less host->device traffic)")
    p.add_argument("--preset", default="vigor", choices=["vigor", "tiny"],
                   help="tiny = miniature geometry smoke mode (CPU-friendly)")
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
    from ccvpe_tpu.data.vigor import VIGORDataset

    training = args.training == "True"
    # round ori_noise to the bin grid (train_VIGOR.py:49)
    ori_noise = 18.0 * (args.ori_noise // 18.0)
    circular = args.FoV == 360

    train_cfg = cfg_lib.TrainConfig(
        learning_rate=args.learning_rate, batch_size=args.batch_size,
        grad_accum_steps=args.grad_accum,
        epochs=args.epochs, weight_ori=args.weight_ori,
        weight_infonce=args.weight_infoNCE,
        pretrained_backbone=args.pretrained_backbone,
        warm_start=args.warm_start)

    if training:
        from ccvpe_tpu.train.trainer import Trainer
        model_cfg = (cfg_lib.tiny() if args.preset == "tiny"
                     else cfg_lib.vigor(circular=circular))
        dataset = VIGORDataset(args.root, split=args.area, train=True,
                               pos_only=args.pos_only == "True",
                               ori_noise=ori_noise,
                               image_dtype=args.image_dtype,
                               grd_size=model_cfg.grd_size,
                               sat_size=model_cfg.sat_size)
        # 80/20 split with the reference's exact RNG stream
        # (train_VIGOR.py:21 np.random.seed(0); :83-91 shuffle)
        idx = np.arange(len(dataset))
        np.random.RandomState(0).shuffle(idx)
        split = int(len(idx) * 0.8)
        train_idx, val_idx = idx[:split].tolist(), idx[split:].tolist()

        trainer = Trainer(model_cfg, train_cfg, workdir=args.workdir)
        trainer.fit(
            train_loader_fn=lambda epoch: ThreadedLoader(
                dataset, local_bs, shuffle=True, seed=epoch,
                num_workers=args.num_workers, indices=train_idx,
                shard_id=shard_id, num_shards=num_shards),
            val_loader_fn=lambda epoch: ThreadedLoader(
                dataset, local_bs, shuffle=False,
                num_workers=args.num_workers, indices=val_idx,
                shard_id=shard_id, num_shards=num_shards),
            meters_per_pixel=dataset.meters_per_pixel,
        )
    else:
        from ccvpe_tpu.train.evaluate import evaluate_vigor
        evaluate_vigor(args, ori_noise=ori_noise, circular=circular)


if __name__ == "__main__":
    main()
