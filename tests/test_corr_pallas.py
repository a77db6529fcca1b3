"""Pallas fused correlation kernel vs. the XLA matmul formulation, in
interpreter mode on CPU (real-TPU parity is exercised by bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ccvpe_tpu.ops.corr import rolled_corr
from ccvpe_tpu.ops.corr_pallas import rolled_corr_pallas

CASES = [
    (2, 8, 8, 1280, 1280, 64, 20, False),
    (1, 16, 16, 640, 640, 32, 20, False),
    (1, 8, 8, 2048, 512, 128, 16, False),
    (2, 8, 8, 1280, 224, 64, 20, True),
    # D < 128: the combined single-matmul path ([s|s^2] @ [G';M])
    (2, 16, 16, 40, 40, 2, 20, False),       # VIGOR scale 6 channel plan
    (1, 16, 16, 80, 80, 4, 20, False),       # VIGOR scale 5
    (1, 8, 8, 64, 32, 8, 16, False),         # KITTI-like narrow window
    (1, 8, 8, 40, 20, 2, 20, True),          # center window, D < 128
]


@pytest.mark.parametrize("case", CASES)
def test_pallas_matches_xla(case, rng):
    b, h, w, d, l, shift, k, center = case
    sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(b, l)).astype(np.float32))
    ref = rolled_corr(sat, grd, shift, k, center)
    with pltpu.force_tpu_interpret_mode():
        out = rolled_corr_pallas(sat, grd, shift, k, center)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_pallas_gradients_match_xla(rng):
    b, h, w, d, l, shift, k = 1, 8, 8, 256, 256, 16, 16
    sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(b, l)).astype(np.float32))

    def loss_xla(sat, grd):
        return jnp.sum(jnp.sin(rolled_corr(sat, grd, shift, k)))

    def loss_pallas(sat, grd):
        return jnp.sum(jnp.sin(rolled_corr_pallas(sat, grd, shift, k)))

    gs_ref, gg_ref = jax.grad(loss_xla, argnums=(0, 1))(sat, grd)
    with pltpu.force_tpu_interpret_mode():
        gs, gg = jax.grad(loss_pallas, argnums=(0, 1))(sat, grd)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref),
                               atol=1e-4, rtol=1e-3)
