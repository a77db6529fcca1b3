"""Turnkey released-checkpoint parity runbook.

Given dataset roots + reference checkpoints (.pt state dicts from the
reference release, README.md:30, or this repo's Orbax run dirs), emit the
FULL reference-protocol accuracy table in one command:

  * VIGOR samearea / crossarea x known (ori_noise=0) / unknown (ori_noise=180,
    fixture orientations) orientation   (reference train_VIGOR.py:246-338)
  * KITTI test1 / test2 with longitudinal/lateral decomposition + recalls
    @1/3/5 m and deg                    (reference train_KITTI.py:281-432)
  * Oxford RobotCar 3 test traversals   (reference train_OxfordRobotCar.py:195-397)

Only the sections whose roots/checkpoints are provided run, so partial
tables (e.g. VIGOR only) work. Results print as one table and are written
as JSON to --out.

Cross-check (--torch_check): exports the loaded JAX weights back to a
reference-format state dict (utils/torch_convert.export_cvm) and runs the
torch reference model (loaded from CCVPE_REFERENCE) side-by-side on one
random batch, printing the max |heatmap delta| - a direct bridge to the
original scripts' numbers without leaving this repo.

Usage (on a machine with the real datasets):
  python scripts/parity_eval.py \
      --vigor_root /data/VIGOR \
      --vigor_samearea_ckpt models/VIGOR/samearea/model.pt \
      --vigor_crossarea_ckpt models/VIGOR/crossarea/model.pt \
      --kitti_root /data/KITTI --kitti_ckpt models/KITTI/model.pt \
      --kitti_test1 test1_files.txt --kitti_test2 test2_files.txt \
      --oxford_grd_root /data/Oxford/ --oxford_sat_path /data/Oxford/map.png \
      --oxford_ckpt models/Oxford/model.pt \
      --out parity_table.json --torch_check

Synthetic-fixture exercise (no real data needed): tests/test_parity_eval.py
runs every section of this script end-to-end in-container.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vigor_section(args) -> dict:
    from ccvpe_tpu.train.evaluate import evaluate_vigor

    out = {}
    for area, ckpt in (("samearea", args.vigor_samearea_ckpt),
                       ("crossarea", args.vigor_crossarea_ckpt)):
        if not ckpt:
            continue
        for label, ori_noise in (("known_ori", 0.0), ("unknown_ori", 180.0)):
            ns = SimpleNamespace(
                root=args.vigor_root, area=area, checkpoint=ckpt,
                batch_size=args.batch_size, num_workers=args.num_workers,
                FoV=args.fov)
            print(f"== VIGOR {area} {label} (FoV {args.fov}) ==", flush=True)
            try:
                out[f"{area}/{label}"] = evaluate_vigor(
                    ns, ori_noise=ori_noise, circular=(args.fov == 360))
            except FileNotFoundError as e:
                # unknown-orientation eval REQUIRES the orientation fixtures
                # (fail-loud policy, data/fixtures.py); record and continue
                print(f"skipped: {e}", flush=True)
                out[f"{area}/{label}"] = {"error": str(e)}
    return out


def kitti_section(args) -> dict:
    from ccvpe_tpu.train.evaluate import evaluate_kitti

    ns = SimpleNamespace(
        root=args.kitti_root, checkpoint=args.kitti_ckpt,
        test1_file=args.kitti_test1, test2_file=args.kitti_test2,
        shift_range_lat=args.kitti_shift, shift_range_lon=args.kitti_shift,
        rotation_range=args.kitti_rot,
        batch_size=args.batch_size, num_workers=args.num_workers)
    print("== KITTI test1/test2 ==", flush=True)
    return evaluate_kitti(ns)


def oxford_section(args) -> dict:
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.data.oxford import OxfordDataset
    from ccvpe_tpu.train.evaluate import _load_params
    from ccvpe_tpu.train.stream import stream_eval

    model_cfg = cfg_lib.oxford()
    dataset = OxfordDataset(args.oxford_grd_root, args.oxford_sat_path,
                            split="test")
    model, params, batch_stats = _load_params(model_cfg, args.oxford_ckpt)
    mpp = dataset.meters_per_pixel()
    bounds = np.cumsum((0,) + dataset.traversal_lens)
    out = {}
    for t in range(3):
        print(f"== Oxford traversal {t + 1} ==", flush=True)
        out[f"traversal{t + 1}"] = stream_eval(
            model, model_cfg, params, batch_stats, dataset,
            indices=range(bounds[t], bounds[t + 1]),
            batch_size=args.batch_size, meters_per_pixel=mpp,
            num_workers=args.num_workers)
    return out


def torch_check(model_cfg_name: str, checkpoint: str) -> dict:
    """Round-trip the loaded weights to reference format and compare one
    forward against the torch reference model (CCVPE_REFERENCE mount)."""
    import torch

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.evaluate import _load_params
    from ccvpe_tpu.train.step import make_eval_step
    from ccvpe_tpu.utils.torch_convert import export_cvm

    # reference loader with the heavyweight-import stubs + no-download
    # from_pretrained patch (tools/gen_golden.py:33-61)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from gen_golden import load_reference
    ref_models = load_reference()

    model_cfg = getattr(cfg_lib, model_cfg_name)()
    model, params, batch_stats = _load_params(model_cfg, checkpoint)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_cvm(params, batch_stats,
                                 num_scales=model_cfg.num_scales).items()}
    if model_cfg_name == "vigor":
        ref = ref_models.CVM_VIGOR("cpu", circular_padding=True)
    elif model_cfg_name == "kitti":
        ref = ref_models.CVM_KITTI("cpu")
    else:
        ref = ref_models.CVM_OxfordRobotCar("cpu")
    ref.load_state_dict(sd)
    ref.eval()

    rng = np.random.default_rng(0)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    grd = rng.normal(size=(1, hg, wg, 3)).astype(np.float32)
    sat = rng.normal(size=(1, hs, ws, 3)).astype(np.float32)
    step = make_eval_step(model, model_cfg)
    heat_jax, _ = step(params, batch_stats, grd, sat)
    with torch.no_grad():
        _, heat_ref, *_ = ref(torch.from_numpy(grd).permute(0, 3, 1, 2),
                              torch.from_numpy(sat).permute(0, 3, 1, 2))
    delta = float(np.abs(np.asarray(heat_jax)[..., 0]
                         - heat_ref.numpy()[:, 0]).max())
    print(f"torch cross-check ({model_cfg_name}): max |heatmap delta| "
          f"= {delta:.2e}", flush=True)
    return {"max_heatmap_delta": delta}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--vigor_root")
    p.add_argument("--vigor_samearea_ckpt")
    p.add_argument("--vigor_crossarea_ckpt")
    p.add_argument("--fov", type=int, default=360)
    p.add_argument("--kitti_root")
    p.add_argument("--kitti_ckpt")
    p.add_argument("--kitti_test1")
    p.add_argument("--kitti_test2")
    p.add_argument("--kitti_shift", type=float, default=20.0)
    p.add_argument("--kitti_rot", type=float, default=10.0)
    p.add_argument("--oxford_grd_root")
    p.add_argument("--oxford_sat_path")
    p.add_argument("--oxford_ckpt")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--out", default="parity_table.json")
    p.add_argument("--torch_check", action="store_true",
                   help="export weights to reference format and diff one "
                        "forward against the torch reference model")
    args = p.parse_args(argv)

    table = {}
    if args.vigor_root:
        table["vigor"] = vigor_section(args)
        if args.torch_check and args.vigor_samearea_ckpt:
            table["vigor"]["torch_check"] = torch_check(
                "vigor", args.vigor_samearea_ckpt)
    if args.kitti_root:
        table["kitti"] = kitti_section(args)
        if args.torch_check and args.kitti_ckpt:
            table["kitti"]["torch_check"] = torch_check(
                "kitti", args.kitti_ckpt)
    if args.oxford_grd_root:
        table["oxford"] = oxford_section(args)
        if args.torch_check and args.oxford_ckpt:
            table["oxford"]["torch_check"] = torch_check(
                "oxford", args.oxford_ckpt)
    if not table:
        p.error("no section selected - pass at least one dataset root")

    print("\n================ PARITY TABLE ================")
    for section, rows in table.items():
        for row, metrics in rows.items():
            if not isinstance(metrics, dict):
                continue
            cells = " ".join(f"{k}={v:.4f}" for k, v in metrics.items()
                             if isinstance(v, float))
            print(f"{section:8s} {row:24s} {cells}")
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out}")
    return table


if __name__ == "__main__":
    main()
