"""uint8 ingest path: ship raw resized pixels, normalize on device
(4x less H2D traffic than host-normalized float32; also matches the
reference's preprocessing order, which resizes in uint8 via PIL before
ToTensor/Normalize, reference train_VIGOR.py:57-70)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image
import pytest

from ccvpe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, load_image
from ccvpe_tpu.train.step import device_normalize


def test_device_normalize_matches_host():
    r = np.random.default_rng(0)
    u8 = r.integers(0, 256, size=(2, 8, 10, 3), dtype=np.uint8)
    got = np.asarray(device_normalize(jnp.asarray(u8)))
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_normalize_passthrough_f32():
    x = jnp.ones((1, 4, 4, 3), jnp.float32) * 0.3
    assert device_normalize(x) is x


def test_load_image_uint8_consistent_with_float(tmp_path):
    """PIL fallback: the f32 path normalizes the SAME uint8 resized pixels,
    so device_normalize(uint8 path) == f32 path exactly."""
    r = np.random.default_rng(1)
    p = str(tmp_path / "img.png")
    PIL.Image.fromarray(r.integers(0, 255, (97, 130, 3), dtype=np.uint8)).save(p)

    os.environ["CCVPE_NATIVE_IO"] = "0"
    try:
        u8 = load_image(p, (48, 64), dtype="uint8")
        f32 = load_image(p, (48, 64))
    finally:
        os.environ.pop("CCVPE_NATIVE_IO")
    assert u8.dtype == np.uint8 and u8.shape == (48, 64, 3)
    np.testing.assert_allclose(np.asarray(device_normalize(jnp.asarray(u8))),
                               f32, atol=1e-6)


def test_load_image_uint8_native_close_to_pil(tmp_path):
    from ccvpe_tpu.data import native_io
    if not native_io.available():
        pytest.skip("native io not built")
    r = np.random.default_rng(2)
    p = str(tmp_path / "img.png")
    arr = r.integers(0, 255, (97, 130, 3), dtype=np.uint8)
    PIL.Image.fromarray(arr).save(p)
    nat = native_io.load_image_raw_native(p, (48, 64))
    pil = np.asarray(PIL.Image.fromarray(arr).resize((64, 48),
                                                     PIL.Image.BILINEAR))
    assert nat.dtype == np.uint8
    assert np.abs(nat.astype(int) - pil.astype(int)).max() <= 1


def test_vigor_dataset_uint8(tmp_path):
    """VIGOR with image_dtype='uint8' yields uint8 images whose on-device
    normalization equals the float32 pipeline (PIL path)."""
    from tests.test_datasets import make_img  # reuse the fixture builder
    import random as pyrandom

    root = str(tmp_path)
    city = "NewYork"
    sats = [f"sat_{i}.png" for i in range(3)]
    os.makedirs(os.path.join(root, "splits_new", city), exist_ok=True)
    with open(os.path.join(root, "splits_new", city, "satellite_list.txt"), "w") as f:
        f.write("\n".join(sats) + "\n")
    for s in sats:
        make_img(os.path.join(root, city, "satellite", s), (640, 640), (10, 60, 10))
    pano = "pano_0.jpg"
    make_img(os.path.join(root, city, "panorama", pano), (1024, 512), (60, 10, 10))
    fields = [pano]
    for j in range(4):
        fields += [sats[j % 3], "10.0", "-20.0"]
    for tag in ("same_area_balanced_train.txt",):
        with open(os.path.join(root, "splits_new", city, tag), "w") as f:
            f.write(" ".join(fields) + "\n")
    # restrict to one city: splits files for other cities are absent, so
    # construct with samearea but patch the city tuple via the same files
    for other in ("Seattle", "SanFrancisco", "Chicago"):
        os.makedirs(os.path.join(root, "splits_new", other), exist_ok=True)
        with open(os.path.join(root, "splits_new", other, "satellite_list.txt"), "w") as f:
            f.write("")
        with open(os.path.join(root, "splits_new", other,
                               "same_area_balanced_train.txt"), "w") as f:
            f.write("")

    from ccvpe_tpu.data.vigor import VIGORDataset

    os.environ["CCVPE_NATIVE_IO"] = "0"
    try:
        ds8 = VIGORDataset(root, train=True, image_dtype="uint8")
        ds32 = VIGORDataset(root, train=True)
        s8 = ds8.__getitem__(0, rng=pyrandom.Random(3))
        s32 = ds32.__getitem__(0, rng=pyrandom.Random(3))
    finally:
        os.environ.pop("CCVPE_NATIVE_IO")
    assert s8.grd.dtype == np.uint8 and s8.sat.dtype == np.uint8
    assert s8.row_offset == s32.row_offset and s8.angle_deg == s32.angle_deg
    np.testing.assert_allclose(
        np.asarray(device_normalize(jnp.asarray(s8.grd))), s32.grd, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(device_normalize(jnp.asarray(s8.sat))), s32.sat, atol=1e-6)


@pytest.mark.slow
def test_train_step_uint8_equals_f32():
    """The jitted train step with uint8 inputs matches the float32 path."""
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.step import Batch, create_train_state, make_train_step

    cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(batch_size=2)
    model, state, tx = create_train_state(cfg, train_cfg, jax.random.PRNGKey(17))
    step = make_train_step(model, tx, cfg, train_cfg, donate=False)

    r = np.random.default_rng(4)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    grd8 = r.integers(0, 256, (2, hg, wg, 3), dtype=np.uint8)
    sat8 = r.integers(0, 256, (2, hs, ws, 3), dtype=np.uint8)
    common = dict(
        row_offset=jnp.asarray([3.0, -5.0], jnp.float32),
        col_offset=jnp.asarray([-2.0, 7.0], jnp.float32),
        angle_deg=jnp.asarray([10.0, 200.0], jnp.float32))
    b8 = Batch(grd=jnp.asarray(grd8), sat=jnp.asarray(sat8), **common)
    b32 = Batch(grd=jnp.asarray(np.asarray(device_normalize(jnp.asarray(grd8)))),
                sat=jnp.asarray(np.asarray(device_normalize(jnp.asarray(sat8)))),
                **common)
    key = jax.random.PRNGKey(0)
    _, m8 = step(state, b8, key)
    _, m32 = step(state, b32, key)
    np.testing.assert_allclose(float(m8["loss"]), float(m32["loss"]),
                               rtol=2e-5)
