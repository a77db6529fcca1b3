"""TRAIN-mode objective parity vs. the PyTorch reference: train-mode BN
(batch statistics), on-device GT rendering vs. the reference host renderer,
the full combined loss (train_VIGOR.py:137-146), and the BN running-stat EMA
update. drop_connect disabled in both (RNG streams cannot be aligned)."""

import os
import subprocess
import sys
from unittest import mock

import jax
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.models.cvm import CVM
from ccvpe_tpu.train.step import Batch, compute_losses
from ccvpe_tpu.utils.torch_convert import convert_cvm, to_variables

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "_golden", "vigor_train.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_golden.py"),
             "--variant", "vigor_train", "--out", GOLDEN],
            check=True, cwd=ROOT, timeout=1800)
    return np.load(GOLDEN)


@pytest.mark.slow
def test_train_mode_objective_parity(golden):
    import ccvpe_tpu.nn.efficientnet as effnet

    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd/")}
    grd = np.transpose(golden["grd"], (0, 2, 3, 1))
    sat = np.transpose(golden["sat"], (0, 2, 3, 1))
    batch = Batch(
        grd=grd, sat=sat,
        row_offset=golden["row_offset"], col_offset=golden["col_offset"],
        angle_deg=golden["angle_deg"])

    model_cfg = cfg_lib.vigor()
    train_cfg = cfg_lib.TrainConfig()
    model = CVM(model_cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), grd, sat, False))
    params, stats = convert_cvm(sd)
    variables = to_variables(params, stats, template)

    # disable drop-connect to match the patched reference
    with mock.patch.object(effnet, "DROP_CONNECT_RATE", 0.0):
        out, mutated = model.apply(
            variables, batch.grd, batch.sat, True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
    total, metrics = compute_losses(model_cfg, train_cfg, out, batch)

    # train-mode logits + score stacks (BN on batch statistics)
    np.testing.assert_allclose(np.asarray(out.logits), golden["logits"],
                               atol=2e-3, rtol=1e-3)
    for i, s in enumerate(out.matching_scores):
        np.testing.assert_allclose(
            np.asarray(s), np.transpose(golden[f"scores{i + 1}"], (0, 2, 3, 1)),
            atol=2e-3, err_msg=f"scale {i + 1}")

    # loss components and total
    np.testing.assert_allclose(float(metrics["loss_ce"]), golden["loss_ce"],
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["loss_ori"]), golden["loss_ori"],
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["loss_infonce"]),
                               golden["loss_infonce"], rtol=1e-3)
    np.testing.assert_allclose(float(total), golden["loss_total"], rtol=1e-3)

    # BN running-stat EMA update (flax uses biased batch var in the EMA,
    # torch uses unbiased; with N = B*H*W = 2*16*16 = 512 at the deepest
    # layer the relative difference is <= 1/(N-1) on the 1% update)
    new_stats = mutated["batch_stats"]["sat_encoder"]["head_bn"]["bn"]
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               golden["bn_check/mean"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               golden["bn_check/var"], rtol=2e-4, atol=1e-5)
