"""Dataset pipelines on synthetic on-disk fixtures (VIGOR / KITTI / Oxford
directory layouts per reference datasets.py)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
import PIL.Image


def make_img(path, size_wh, color):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    PIL.Image.new("RGB", size_wh, color).save(path)


@pytest.fixture(scope="module")
def vigor_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vigor"))
    for city in ("NewYork", "Seattle", "SanFrancisco", "Chicago"):
        sats = [f"sat_{city}_{i}.png" for i in range(3)]
        os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
        with open(os.path.join(root, "splits_new", city, "satellite_list.txt"), "w") as f:
            f.write("\n".join(sats) + "\n")
        for s in sats:
            make_img(os.path.join(root, city, "satellite", s), (640, 640), (10, 60, 10))
        lines = []
        for i in range(4):
            pano = f"pano_{city}_{i}.jpg"
            make_img(os.path.join(root, city, "panorama", pano), (1024, 512), (60, 10, 10))
            fields = [pano]
            for j in range(4):
                fields += [sats[(i + j) % 3], str(10.0 + i), str(-20.0 + j)]
            lines.append(",".join([" ".join(fields)]))
        for tag in ("same_area_balanced_train.txt", "same_area_balanced_test.txt",
                    "pano_label_balanced.txt"):
            with open(os.path.join(root, "splits_new", city, tag), "w") as f:
                f.write("\n".join(lines) + "\n")
    return root


def test_vigor_dataset(vigor_root):
    from ccvpe_tpu.data.vigor import VIGORDataset
    ds = VIGORDataset(vigor_root, split="samearea", train=True)
    assert len(ds) == 16
    import random
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s.grd.shape == (320, 640, 3)
    assert s.sat.shape == (512, 512, 3)
    assert 0 <= s.angle_deg < 360
    # deltas rescaled 640 -> 512
    assert abs(s.row_offset - round(10.0 / 640 * 512)) < 1e-6
    assert abs(s.col_offset - round(-20.0 / 640 * 512)) < 1e-6
    assert s.city == "NewYork"
    assert ds.meters_per_pixel("Seattle") == 0.100817 / 512 * 640

    # deterministic orientation fixture path
    fixed = np.full(16, 90.0)
    ds2 = VIGORDataset(vigor_root, split="samearea", train=False,
                       random_orientation=fixed)
    s2 = ds2.__getitem__(3, rng=random.Random(1))
    assert abs(s2.angle_deg - 90.0) < 1e-5


def test_corrupt_image_degrades_to_blank(vigor_root, caplog):
    """A corrupt panorama or aerial patch yields a blank image with a logged
    warning instead of raising (reference datasets.py:100-105) - one bad
    JPEG in a 100k-pair epoch must not abort a multi-hour run."""
    import logging
    import random
    from ccvpe_tpu.data.loader import ThreadedLoader
    from ccvpe_tpu.data.vigor import VIGORDataset

    ds = VIGORDataset(vigor_root, split="samearea", train=True)
    # corrupt one panorama AND one aerial patch on disk
    with open(ds.grd_list[1], "wb") as f:
        f.write(b"not a jpeg")
    with open(ds.sat_list[int(ds.label[2][0])], "wb") as f:
        f.write(b"\xff\xd8broken")
    try:
        with caplog.at_level(logging.WARNING, logger="ccvpe_tpu.data"):
            s1 = ds.__getitem__(1, rng=random.Random(0))
            s2 = ds.__getitem__(2, rng=random.Random(0))
        assert s1.grd.shape == (320, 640, 3) and float(np.abs(
            s1.grd * 0 + s1.grd).sum()) >= 0  # finite, right shape
        assert s2.sat.shape == (512, 512, 3)
        assert any("unreadable image" in r.message for r in caplog.records)
        # the epoch-level path: a loader pass over the poisoned dataset
        # completes without raising
        n = 0
        for b in ThreadedLoader(ds, 4, shuffle=False, num_workers=2):
            n += b["grd"].shape[0]
        assert n == len(ds) // 4 * 4
    finally:
        make_img(ds.grd_list[1], (1024, 512), (60, 10, 10))
        make_img(ds.sat_list[int(ds.label[2][0])], (640, 640), (10, 60, 10))


def test_vigor_semipositives(vigor_root):
    """pos_only=False samples among positive + semi-positive aerial refs,
    rejecting ones whose GT falls outside the patch (datasets.py:127-133)."""
    import random
    from ccvpe_tpu.data.vigor import VIGORDataset
    ds = VIGORDataset(vigor_root, split="samearea", train=True, pos_only=False)
    seen_offsets = set()
    for trial in range(8):
        s = ds.__getitem__(1, rng=random.Random(trial))
        assert abs(s.row_offset) < 320 and abs(s.col_offset) < 320
        seen_offsets.add((float(s.row_offset), float(s.col_offset)))
    # different semi-positive picks yield different offsets
    assert len(seen_offsets) >= 2


def test_vigor_crossarea_split(vigor_root):
    from ccvpe_tpu.data.vigor import VIGORDataset
    tr = VIGORDataset(vigor_root, split="crossarea", train=True)
    te = VIGORDataset(vigor_root, split="crossarea", train=False)
    assert {c for c in tr.city_of} == {"NewYork", "Seattle"}
    assert {c for c in te.city_of} == {"SanFrancisco", "Chicago"}


def test_vigor_pano_roll_is_rotation(vigor_root):
    """The panorama roll equals azimuth rotation of the image columns."""
    import random
    from ccvpe_tpu.data.vigor import VIGORDataset
    fixed = np.full(16, 180.0)
    ds = VIGORDataset(vigor_root, split="samearea", train=False,
                      random_orientation=fixed)
    s = ds.__getitem__(0, rng=random.Random(0))
    # rolled by half the width
    assert abs(s.angle_deg - 180.0) < 1e-5


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    drive = "2011_09_26/2011_09_26_drive_0001_sync/"
    assert len(drive) == 38
    fname = drive + "0000000000.png"
    make_img(os.path.join(root, "satmap", fname), (512, 512), (20, 80, 20))
    make_img(os.path.join(root, "raw_data", drive, "image_02/data/0000000000.png"),
             (1242, 375), (80, 20, 20))
    oxts = os.path.join(root, "raw_data", drive, "oxts/data/0000000000.txt")
    os.makedirs(os.path.dirname(oxts), exist_ok=True)
    with open(oxts, "w") as f:
        f.write("49.0 8.4 112.9 0.01 0.02 " + str(np.pi / 2) + " rest\n")
    train_file = os.path.join(root, "train.txt")
    with open(train_file, "w") as f:
        f.write(fname + "\n")
    test_file = os.path.join(root, "test.txt")
    with open(test_file, "w") as f:
        f.write(f"{fname} 0.5 -0.25 0.1\n")
    return root, train_file, test_file


def test_kitti_dataset(kitti_root):
    import random
    from ccvpe_tpu.data.kitti import KittiDataset, meter_per_pixel
    root, train_file, test_file = kitti_root
    ds = KittiDataset(root, train_file, train=True, rotation_range=10)
    assert len(ds) == 1
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s.grd.shape == (256, 1024, 3)
    assert s.sat.shape == (512, 512, 3)
    assert 0 <= s.angle_deg < 360
    # heading from oxts field 5 (pi/2 rad = 90 deg)
    assert abs(s.heading_deg - 90.0) < 1e-4
    # mpp formula (datasets.py:368-372)
    assert abs(meter_per_pixel() - 156543.03392 * np.cos(49.015 * np.pi / 180)
               / 2 ** 18 / 2) < 1e-9

    dt = KittiDataset(root, test_file, train=False, rotation_range=10)
    s2 = dt.__getitem__(0, rng=random.Random(0))
    # test: random_ori = theta * range = 0.1*10 = 1 deg -> angle = 89
    assert abs(s2.angle_deg - 89.0) < 1e-4


@pytest.fixture(scope="module")
def oxford_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oxford"))
    sat_path = os.path.join(root, "map.png")
    PIL.Image.new("RGB", (2000, 2000), (15, 70, 15)).save(sat_path)
    # one frame near map pixel (900, 900) -> UTM control point 1
    img_rel = "frames/f0.png"
    make_img(os.path.join(root, img_rel), (1280, 960), (70, 15, 15))
    line = f"{img_rel} x 619400.0 5736195.0"
    for name in ("training.txt", "validation.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write(line + "\n")
    for name in ("test1_j.txt", "test2_j.txt", "test3_j.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write(line + "\n")
    yaw = np.array([np.pi])  # west-0 CW pi -> east... angle = 90 deg
    for name in ("train_yaw.npy", "val_yaw.npy", "test_yaw.npy"):
        np.save(os.path.join(root, name), yaw)
    return root, sat_path


def test_oxford_dataset(oxford_root):
    import random
    from ccvpe_tpu.data.oxford import OxfordDataset
    root, sat_path = oxford_root
    ds = OxfordDataset(root + "/", sat_path, split="train")
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s.grd.shape == (154, 231, 3)
    assert s.sat.shape == (512, 512, 3)
    # yaw pi (west-0 CW) -> (180 - 90) = 90 deg north-0 CW
    assert abs(s.angle_deg - 90.0) < 1e-4
    assert abs(ds.meters_per_pixel() - 0.09240351462361521 / 512 * 800) < 1e-12

    dt = OxfordDataset(root + "/", sat_path, split="test")
    assert dt.traversal_lens == (1, 1, 1)
    s2 = dt.__getitem__(0, rng=random.Random(0))
    # deterministic tiling: offsets within the 512 output
    assert abs(s2.row_offset) <= 256 and abs(s2.col_offset) <= 256
