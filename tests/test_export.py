"""Reverse converter: our CVM variables -> reference-format state dict.
Round trip convert_cvm(export_cvm(x)) must be the identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.models.cvm import CVM
from ccvpe_tpu.utils.torch_convert import convert_cvm, export_cvm, flatten


@pytest.fixture(scope="module")
def tiny_variables():
    cfg = cfg_lib.tiny()
    model = CVM(cfg)
    hg, wg = cfg.grd_size
    hs, ws = cfg.sat_size
    return model.init(jax.random.PRNGKey(3),
                      jnp.zeros((1, hg, wg, 3)), jnp.zeros((1, hs, ws, 3)),
                      False)


def test_export_roundtrip(tiny_variables):
    variables = tiny_variables
    sd = export_cvm(variables["params"], variables["batch_stats"])
    # torch-style names present
    assert "grd_efficientnet._conv_stem.weight" in sd
    assert "deconv6.weight" in sd and "conv1_ori.2.bias" in sd
    assert sd["grd_efficientnet._conv_stem.weight"].shape == (32, 3, 3, 3)

    params, stats = convert_cvm(sd)
    ref_p = flatten(variables["params"])
    ref_s = flatten(variables["batch_stats"])
    assert set(params) == set(ref_p)
    assert set(stats) == set(ref_s)
    for k in ref_p:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(ref_p[k]), err_msg=str(k))
    for k in ref_s:
        np.testing.assert_array_equal(np.asarray(stats[k]),
                                      np.asarray(ref_s[k]), err_msg=str(k))


def test_global_negatives_infonce():
    """Harder denominator: per-sample softmax vs batch-pooled logsumexp."""
    from ccvpe_tpu.train.losses import infonce_loss
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.uniform(-1, 1, (4, 100)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(0, 1, (4, 100)) ** 6).astype(np.float32))
    local = float(infonce_loss(scores, labels))
    glob = float(infonce_loss(scores, labels, global_negatives=True))
    assert np.isfinite(local) and np.isfinite(glob)
    # pooled denominator >= per-sample denominator => loss >= local - log B..
    assert glob > local
