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
