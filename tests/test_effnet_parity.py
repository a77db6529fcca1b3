"""Golden parity: Flax EfficientNet-B0 vs. the PyTorch reference backbone
(reference efficientnet_pytorch/model.py:278-326) with randomized converted
weights, plain and circular padding. Fixtures are generated on demand by
tools/gen_golden.py (reference used as a runtime oracle only)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from ccvpe_tpu.nn.efficientnet import EfficientNetB0
from ccvpe_tpu.utils.torch_convert import convert_backbone, to_variables

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "_golden", "backbone.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_golden.py"),
             "--variant", "backbone", "--out", GOLDEN],
            check=True, cwd=ROOT, timeout=600,
        )
    return np.load(GOLDEN)


def test_pretrained_backbone_init(golden):
    """ImageNet-B0 style init: both CVM encoders filled from one backbone
    state dict, heads left at random init (reference models.py:55,99)."""
    import jax.numpy as jnp
    from ccvpe_tpu.core import config as cfg_lib
    from ccvpe_tpu.models.cvm import CVM
    from ccvpe_tpu.utils.torch_convert import init_with_pretrained_backbone

    sd = {k[len("plain/sd/"):]: golden[k] for k in golden.files
          if k.startswith("plain/sd/")}
    cfg = cfg_lib.tiny()
    model = CVM(cfg)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hg, wg, 3)), jnp.zeros((1, hs, ws, 3)),
                           False)
    filled = init_with_pretrained_backbone(variables, sd)
    # encoder weights come from the state dict
    got = np.asarray(filled["params"]["grd_encoder"]["stem_conv"]["kernel"])
    want = sd["_conv_stem.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    got_sat = np.asarray(filled["params"]["sat_encoder"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(got_sat, want)
    # BN running stats transferred
    np.testing.assert_array_equal(
        np.asarray(filled["batch_stats"]["sat_encoder"]["head_bn"]["bn"]["mean"]),
        sd["_bn1.running_mean"])
    # heads keep their random init
    np.testing.assert_array_equal(
        np.asarray(filled["params"]["sat_desc"]["linear"]["kernel"]),
        np.asarray(variables["params"]["sat_desc"]["linear"]["kernel"]))


@pytest.mark.parametrize("tag", ["plain", "circular"])
def test_backbone_parity(golden, tag):
    sd = {k[len(f"{tag}/sd/"):]: golden[k] for k in golden.files
          if k.startswith(f"{tag}/sd/")}
    x_nchw = golden[f"{tag}/input"]
    x = np.transpose(x_nchw, (0, 2, 3, 1))  # NCHW -> NHWC

    model = EfficientNetB0(circular=(tag == "circular"))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    params, stats = convert_backbone(sd)
    variables = to_variables(params, stats, variables)

    feat, multi = model.apply(variables, x, False)

    ref_feat = np.transpose(golden[f"{tag}/features"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(feat), ref_feat, atol=2e-4, rtol=1e-3)
    for i in (0, 2, 4, 10, 15):   # the skip blocks used by the model
        ref_block = np.transpose(golden[f"{tag}/block{i}"], (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(multi[i]), ref_block, atol=2e-4, rtol=1e-3,
            err_msg=f"block {i}")
