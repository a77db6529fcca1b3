"""Edge-fix circular conv == materialized wrap-pad conv, values and grads.

`conv_circular_same` (ops/padding.py) realizes Conv2dStaticCircularPadding
(reference efficientnet_pytorch/utils.py:330-358) without writing the wrapped
tensor: zero-pad conv + exact recompute of the wrap-crossing edge columns.
These tests pin value equality (the edge convs evaluate the identical windows,
so agreement is to fp noise), gradient equality, and that the full backbone
under circular_impl='edgefix' reproduces 'wrap' bit-for-bit given the same
params (the param trees are identical by construction: CircularSameConv
mirrors nn.Conv's "kernel" path/shape/init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.nn.efficientnet import EfficientNetB0
from ccvpe_tpu.ops.padding import (conv_circular_same, pad_same, same_pad_1d)


def _wrap_conv(x, kernel, stride, pad_h, pad_w, groups):
    """Oracle: materialized wrap pad on W, zero pad on H riding the conv."""
    x = pad_same(x, (0, 0), pad_w, circular=True)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=(pad_h, (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


# Every (kernel, stride) in B0 plus the smallest widths that occur (Oxford
# ground bottoms out at W=7); depthwise (groups=C) and dense (groups=1).
CASES = [(3, 1, 16, 8), (3, 2, 16, 8), (5, 1, 16, 8), (5, 2, 16, 8),
         (3, 1, 7, 4), (5, 1, 7, 4), (5, 2, 7, 4), (3, 2, 8, 4)]


@pytest.mark.parametrize("k,s,w,c", CASES)
@pytest.mark.parametrize("groups", ["depthwise", "dense"])
def test_conv_circular_same_matches_wrap(rng, k, s, w, c, groups):
    g = c if groups == "depthwise" else 1
    pad_h = same_pad_1d(224, k, s)
    pad_w = same_pad_1d(224, k, s)
    x = jnp.asarray(rng.normal(size=(2, 9, w, c)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, c // g, c)).astype(np.float32))

    got = conv_circular_same(x, kernel, s, pad_h, pad_w, groups=g)
    want = _wrap_conv(x, kernel, s, pad_h, pad_w, g)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_conv_circular_same_grads_match(rng):
    k, s, g = 5, 1, 1
    pad = same_pad_1d(224, k, s)
    x = jnp.asarray(rng.normal(size=(2, 6, 10, 4)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(k, k, 4, 4)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 6, 10, 4)).astype(np.float32))

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * cot)

    gx, gw = jax.grad(loss(lambda x, w: conv_circular_same(
        x, w, s, pad, pad, groups=g)), argnums=(0, 1))(x, kernel)
    ex, ew = jax.grad(loss(lambda x, w: _wrap_conv(
        x, w, s, pad, pad, g)), argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                               rtol=1e-5, atol=1e-5)


def test_backbone_edgefix_equals_wrap(rng):
    """Same params, both circular impls, identical multiscale features."""
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    wrap = EfficientNetB0(circular=True, circular_impl="wrap")
    edge = EfficientNetB0(circular=True, circular_impl="edgefix")
    params = wrap.init(jax.random.PRNGKey(0), x)
    # param trees are interchangeable (CircularSameConv mirrors nn.Conv)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, params,
        edge.init(jax.random.PRNGKey(0), x)))
    yw, msw = wrap.apply(params, x)
    ye, mse = edge.apply(params, x)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yw),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(mse, msw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
