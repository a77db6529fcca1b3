"""Deconv2x2 implementation equivalence: 'einsum' (matmul + block reshape)
vs 'conv' (native lax.conv_transpose, spatially flipped kernel) must agree
in values and gradients with identical parameters."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.models.cvm import CVM
from ccvpe_tpu.nn.decoder import Deconv2x2


def test_deconv_impls_match(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 13)).astype(np.float32))
    mod_e = Deconv2x2(11, impl="einsum")
    mod_c = Deconv2x2(11, impl="conv")
    variables = mod_e.init(jax.random.PRNGKey(0), x)

    y_e, vjp_e = jax.vjp(lambda v, x: mod_e.apply(v, x), variables, x)
    y_c, vjp_c = jax.vjp(lambda v, x: mod_c.apply(v, x), variables, x)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_c), atol=1e-5)

    ct = jnp.asarray(rng.normal(size=y_e.shape).astype(np.float32))
    for a, b in zip(jax.tree.leaves(vjp_e(ct)), jax.tree.leaves(vjp_c(ct))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_model_forward_same_with_conv_deconv(rng):
    base = cfg_lib.tiny()
    cfg_conv = dataclasses.replace(base, deconv_impl="conv")
    hg, wg = base.grd_size
    hs, ws = base.sat_size
    grd = jnp.asarray(rng.normal(size=(1, hg, wg, 3)).astype(np.float32))
    sat = jnp.asarray(rng.normal(size=(1, hs, ws, 3)).astype(np.float32))

    variables = CVM(base).init(jax.random.PRNGKey(0), grd, sat, False)
    out_e = CVM(base).apply(variables, grd, sat, False)
    out_c = CVM(cfg_conv).apply(variables, grd, sat, False)
    np.testing.assert_allclose(np.asarray(out_c.logits),
                               np.asarray(out_e.logits), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_c.heatmap),
                               np.asarray(out_e.heatmap), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.ori),
                               np.asarray(out_e.ori), atol=1e-4)
