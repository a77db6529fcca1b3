"""Golden parity of the full CVM model vs. the PyTorch reference
(reference models.py:49-343 CVM_VIGOR, :655 CVM_KITTI, :954 CVM_Oxford,
:346 ori-prior variant) with randomized converted weights on real shapes."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.models.cvm import CVM
from ccvpe_tpu.utils.torch_convert import convert_cvm, to_variables

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_golden(variant, extra=()):
    path = os.path.join(ROOT, "tests", "_golden", f"{variant}.npz")
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_golden.py"),
             "--variant", variant, "--out", path, *extra],
            check=True, cwd=ROOT, timeout=1200,
        )
    return np.load(path)


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def run_parity(variant, model_cfg, golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd/")}
    grd = nhwc(golden["grd"])
    sat = nhwc(golden["sat"])

    model = CVM(model_cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grd, sat, False))
    params, stats = convert_cvm(sd, num_scales=model_cfg.num_scales)
    variables = to_variables(params, stats, variables)

    out = model.apply(variables, grd, sat, False)

    np.testing.assert_allclose(
        np.asarray(out.logits), golden["logits"], atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.heatmap), nhwc(golden["heatmap"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.ori), nhwc(golden["ori"]), atol=5e-4, rtol=1e-3)
    for i, s in enumerate(out.matching_scores):
        np.testing.assert_allclose(
            np.asarray(s), nhwc(golden[f"scores{i + 1}"]), atol=5e-4,
            err_msg=f"matching scores, scale {i + 1}")


@pytest.mark.slow
def test_vigor_parity():
    run_parity("vigor", cfg_lib.vigor(), load_golden("vigor"))


@pytest.mark.slow
def test_vigor_ori_prior_parity():
    golden = load_golden("vigor_ori_prior", ["--ori-noise", "54"])
    run_parity("vigor_ori_prior", cfg_lib.vigor(ori_noise=54.0), golden)


@pytest.mark.slow
def test_kitti_parity():
    run_parity("kitti", cfg_lib.kitti(), load_golden("kitti"))


@pytest.mark.slow
def test_oxford_parity():
    run_parity("oxford", cfg_lib.oxford(), load_golden("oxford"))
