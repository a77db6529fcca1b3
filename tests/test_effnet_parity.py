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
