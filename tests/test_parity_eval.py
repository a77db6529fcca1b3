"""The turnkey parity runbook (scripts/parity_eval.py) runs every section
end-to-end on synthetic fixtures: given dataset roots + checkpoints it must
emit the full reference-protocol table in one command, so the on-prem run
with real data + released checkpoints is turnkey."""

import json
import os
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
import PIL.Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _img(path, size_wh, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    PIL.Image.fromarray(
        rng.integers(0, 255, (size_wh[1], size_wh[0], 3), dtype=np.uint8)
    ).save(path)


def _vigor_root(tmp):
    root = str(tmp / "vigor")
    for city in ("NewYork", "Seattle", "SanFrancisco", "Chicago"):
        sats = [f"sat_{city}_{i}.png" for i in range(2)]
        os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
        with open(os.path.join(root, "splits_new", city,
                               "satellite_list.txt"), "w") as f:
            f.write("\n".join(sats) + "\n")
        for s in sats:
            _img(os.path.join(root, city, "satellite", s), (640, 640), 1)
        lines = []
        for i in range(1):
            pano = f"pano_{city}_{i}.jpg"
            _img(os.path.join(root, city, "panorama", pano), (1024, 512), 2)
            fields = [pano]
            for j in range(4):
                fields += [sats[(i + j) % 2], "10.0", "-20.0"]
            lines.append(" ".join(fields))
        for tag in ("same_area_balanced_train.txt",
                    "same_area_balanced_test.txt", "pano_label_balanced.txt"):
            with open(os.path.join(root, "splits_new", city, tag), "w") as f:
                f.write("\n".join(lines) + "\n")
    return root


def _kitti_root(tmp):
    root = str(tmp / "kitti")
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    fname = drive + "0000000000.png"
    _img(os.path.join(root, "satmap", fname), (512, 512), 3)
    _img(os.path.join(root, "raw_data", drive, "image_02/data/0000000000.png"),
         (1242, 375), 4)
    oxts = os.path.join(root, "raw_data", drive, "oxts/data/0000000000.txt")
    os.makedirs(os.path.dirname(oxts), exist_ok=True)
    with open(oxts, "w") as f:
        f.write("49.0 8.4 112.9 0.01 0.02 " + str(np.pi / 2) + " rest\n")
    t1 = os.path.join(root, "test1.txt")
    t2 = os.path.join(root, "test2.txt")
    for path in (t1, t2):
        with open(path, "w") as f:
            f.write(f"{fname} 0.5 -0.25 0.1\n")
    return root, t1, t2


def _oxford_root(tmp):
    root = str(tmp / "oxford")
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    sat_path = os.path.join(root, "map.png")
    _img(sat_path, (2000, 2000), 5)
    _img(os.path.join(root, "frames/f0.png"), (1280, 960), 6)
    line = "frames/f0.png x 619400.0 5736195.0"
    for name in ("training.txt", "validation.txt",
                 "test1_j.txt", "test2_j.txt", "test3_j.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write(line + "\n")
    for name, n in (("train_yaw.npy", 1), ("val_yaw.npy", 1),
                    ("test_yaw.npy", 3)):
        np.save(os.path.join(root, name), np.full(n, np.pi))
    return root + "/", sat_path


def _checkpoint(tmp, name, model_cfg):
    import jax
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.core.checkpoint import CheckpointManager
    from ccvpe_tpu.train.step import create_train_state

    _, state, _ = create_train_state(model_cfg, cfg_lib.TrainConfig(),
                                     jax.random.PRNGKey(17))
    d = str(tmp / name)
    mgr = CheckpointManager(d)
    mgr.save(0, jax.tree.map(np.asarray, state))
    mgr.wait()
    return d


@pytest.mark.slow
def test_parity_eval_all_sections(tmp_path):
    from ccvpe_tpu.core import config as cfg_lib
    import parity_eval

    vroot = _vigor_root(tmp_path)
    kroot, t1, t2 = _kitti_root(tmp_path)
    ogrd, osat = _oxford_root(tmp_path)
    vck = _checkpoint(tmp_path, "ck_vigor", cfg_lib.vigor())
    kck = _checkpoint(tmp_path, "ck_kitti", cfg_lib.kitti())
    ock = _checkpoint(tmp_path, "ck_oxford", cfg_lib.oxford())
    out = str(tmp_path / "table.json")

    table = parity_eval.main([
        "--vigor_root", vroot, "--vigor_samearea_ckpt", vck,
        "--kitti_root", kroot, "--kitti_ckpt", kck,
        "--kitti_test1", t1, "--kitti_test2", t2,
        "--oxford_grd_root", ogrd, "--oxford_sat_path", osat,
        "--oxford_ckpt", ock,
        "--batch_size", "1", "--num_workers", "2", "--out", out,
    ])

    # full reference-protocol coverage: every row present with finite metrics
    assert set(table) == {"vigor", "kitti", "oxford"}
    assert set(table["vigor"]) == {"samearea/known_ori",
                                   "samearea/unknown_ori"}
    for row in table["vigor"].values():
        assert np.isfinite(row["median_distance_m"])
        assert np.isfinite(row["mean_distance_m"])
        assert "mean_prob_at_gt" in row
    assert set(table["kitti"]) == {"test1", "test2"}
    for row in table["kitti"].values():
        for k in ("median_distance_m", "long_recall@1", "lat_recall@1",
                  "ori_recall@1deg"):
            assert k in row, k
    assert set(table["oxford"]) == {"traversal1", "traversal2", "traversal3"}
    for row in table["oxford"].values():
        assert np.isfinite(row["median_distance_m"]) and row["frames"] == 1.0

    with open(out) as f:
        assert json.load(f).keys() == table.keys()
