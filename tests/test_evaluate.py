"""Evaluation helpers: FoV slicing and reference-checkpoint (.pt) loading."""

import numpy as np
import pytest

from ccvpe_tpu.train.evaluate import slice_fov


def test_slice_fov():
    grd = np.arange(2 * 4 * 360 * 3, dtype=np.float32).reshape(2, 4, 360, 3)
    for fov, width in ((360, 360), (180, 180), (90, 90), (108, 108)):
        out = slice_fov(grd, fov)
        assert out.shape == (2, 4, width, 3)
        np.testing.assert_array_equal(out, grd[:, :, :width, :])


@pytest.mark.slow
def test_load_reference_pt_checkpoint(tmp_path):
    """Round-trip a reference-format .pt state dict through the converter via
    the eval loading path (reference train_VIGOR.py:252 semantics)."""
    torch = pytest.importorskip("torch")

    from tests.test_model_parity import load_golden

    golden = load_golden("vigor")
    sd = {k[3:]: torch.from_numpy(np.array(golden[k]))
          for k in golden.files if k.startswith("sd/")}
    pt_path = str(tmp_path / "model.pt")
    torch.save(sd, pt_path)

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.train.evaluate import _load_params

    model, params, batch_stats = _load_params(cfg_lib.vigor(), pt_path)
    got = np.asarray(params["grd_encoder"]["stem_conv"]["kernel"])
    want = np.array(golden["sd/grd_efficientnet._conv_stem.weight"]).transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_gt_location_device_matches_host(rng):
    """jnp GT-pixel twin == numpy original, including tie semantics."""
    import jax.numpy as jnp

    from ccvpe_tpu.ops import pose

    r = rng.uniform(-64, 64, 257).astype(np.float32)
    c = rng.uniform(-64, 64, 257).astype(np.float32)
    # exact tie points: offsets landing halfway between grid nodes
    ys = np.linspace(-64.0, 64.0, 128)
    r[:5] = (ys[3:8] + ys[4:9]) / 2
    hr, hc = pose.gt_location(128, 128, r, c)
    dr, dc = pose.gt_location_device(128, 128, jnp.asarray(r), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(dr), hr)
    np.testing.assert_array_equal(np.asarray(dc), hc)


@pytest.mark.slow
def test_scalar_eval_matches_fullmap_path(rng):
    """eval_over_loader's scalar-only fused step reproduces the full-map
    host decode (fetch heatmap/ori, numpy argmax, prob@GT sample) exactly."""
    import jax

    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.ops import pose
    from ccvpe_tpu.train.evaluate import eval_over_loader
    from ccvpe_tpu.train.step import (create_train_state, make_eval_decode_step,
                                      make_eval_step)
    from tests.test_trainer_resume import SyntheticDataset, make_loader

    cfg = cfg_lib.tiny()
    model, state, _ = create_train_state(cfg, cfg_lib.TrainConfig(),
                                         jax.random.PRNGKey(3))
    params, stats = state.params, state.batch_stats

    decode_step = make_eval_decode_step(model, cfg)
    summary = eval_over_loader(decode_step, params, stats,
                               make_loader(cfg, 8)(0), cfg,
                               meters_per_pixel=0.25, with_prob_at_gt=True)

    # oracle: full-map fetch + host decode (the pre-r5 path)
    full_step = make_eval_step(model, cfg)
    hs, ws = cfg.sat_size
    dist, ori_err, prob = [], [], []
    for raw in make_loader(cfg, 8)(0):
        heatmap, ori = full_step(params, stats, raw["grd"], raw["sat"])
        rows, cols, ang = map(np.asarray, pose.decode_pose(heatmap, ori))
        gr, gc = pose.gt_location(hs, ws, raw["row_offset"], raw["col_offset"])
        dist.extend((np.sqrt((gr - rows) ** 2 + (gc - cols) ** 2) * 0.25).tolist())
        ori_err.extend(pose.angle_error(ang, raw["angle_deg"]).tolist())
        hm = np.asarray(heatmap)
        prob.extend(hm[np.arange(len(gr)), gr, gc, 0].tolist())
    want = pose.summarize(np.array(dist), np.array(ori_err), np.array(prob))

    for k, v in want.items():
        assert abs(summary[k] - v) < 1e-5, (k, summary[k], v)
