"""Orientation-axis (CP-analog) sharding through the MODEL: with
ModelConfig.ori_axis set, every rolled-correlation in CVM carries bin-dim
sharding constraints and GSPMD partitions the matching einsums over the
'model' mesh axis. The sharded forward must equal the unsharded one
(SURVEY.md 2.4 orientation-axis parallelism; the per-bin loop it replaces
is reference models.py:191-202)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.core.mesh import make_mesh, replicated, shard_batch
from ccvpe_tpu.models.cvm import CVM


@pytest.mark.slow
def test_ori_sharded_forward_matches_unsharded(rng):
    base = cfg_lib.tiny()  # num_bins=4 -> 2 bins per device on model=2
    cfg_sharded = dataclasses.replace(base, ori_axis="model")

    hg, wg = base.grd_size
    hs, ws = base.sat_size
    grd = jnp.asarray(rng.normal(size=(4, hg, wg, 3)).astype(np.float32))
    sat = jnp.asarray(rng.normal(size=(4, hs, ws, 3)).astype(np.float32))

    model = CVM(base)
    variables = model.init(jax.random.PRNGKey(0), grd, sat, False)
    out_ref = model.apply(variables, grd, sat, False)

    mesh = make_mesh(data=4, model=2)
    model_sh = CVM(cfg_sharded)
    with jax.set_mesh(mesh):
        vars_sh = jax.device_put(variables, replicated(mesh))
        grd_sh, sat_sh = shard_batch(mesh, (grd, sat))
        out_sh = jax.jit(
            lambda v, g, s: model_sh.apply(v, g, s, False))(vars_sh, grd_sh, sat_sh)

    for i, (a, b) in enumerate(zip(out_sh.matching_scores,
                                   out_ref.matching_scores)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"scale {i + 1}")
    np.testing.assert_allclose(np.asarray(out_sh.heatmap),
                               np.asarray(out_ref.heatmap), atol=1e-5)
    # norm-floor-aware: the normalized ori field amplifies SPMD
    # reduction-order noise at near-zero-norm pixels (see tests/_helpers.py)
    from _helpers import assert_ori_close, raw_ori_norm
    assert_ori_close(out_sh.ori, out_ref.ori,
                     raw_ori_norm(model, variables, grd, sat))


def test_ori_sharded_restricted_bins(rng):
    """ori_axis composes with the orientation-prior restricted bin range
    (odd K, unevenly sharded - GSPMD pads)."""
    from ccvpe_tpu.ops.corr import rolled_corr

    b, h, w, d, shift, k = 2, 4, 4, 256, 64, 4
    sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    bins = (-1, 0, 1)  # ori-prior style odd count (models.py:489)
    ref = rolled_corr(sat, grd, shift, k, bins=bins)

    mesh = make_mesh(data=4, model=2)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda s, g: rolled_corr(
            s, g, shift, k, bins=bins, ori_axis="model"))(sat, grd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
