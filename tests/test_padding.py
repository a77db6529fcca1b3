"""Padding arithmetic vs. the reference's static-224 quirk (SURVEY.md 2.3.3)."""

import jax.numpy as jnp
import numpy as np

from ccvpe_tpu.ops.padding import (
    b0_output_size,
    pad_same,
    same_pad_1d,
    traced_same_pads,
)


def test_same_pad_basic():
    # (i-1)*s + k - i arithmetic (reference utils.py:266-275)
    assert same_pad_1d(224, 3, 2) == (0, 1)
    assert same_pad_1d(112, 3, 2) == (0, 1)
    assert same_pad_1d(56, 5, 2) == (1, 2)
    assert same_pad_1d(14, 5, 2) == (1, 2)
    assert same_pad_1d(7, 3, 1) == (1, 1)
    assert same_pad_1d(7, 5, 1) == (2, 2)
    # stride-1 pad is size-independent: k - 1
    for size in (3, 7, 100, 231):
        assert sum(same_pad_1d(size, 3, 1)) == 2
        assert sum(same_pad_1d(size, 5, 1)) == 4


def test_backbone_output_sizes_match_reference():
    """Verified reference shapes (SURVEY.md 2.3.2): the static-224 pads give
    Oxford 4x7, NOT the 5x8 that true SAME padding would."""
    assert b0_output_size((320, 640)) == (10, 20)    # VIGOR ground
    assert b0_output_size((256, 1024)) == (8, 32)    # KITTI ground
    assert b0_output_size((154, 231)) == (4, 7)      # Oxford ground (quirk!)
    assert b0_output_size((512, 512)) == (16, 16)    # aerial


def test_traced_pads_are_static_constants():
    pads = traced_same_pads()
    assert len(pads) == 17  # stem + 16 blocks
    # stem & stride-2 k3 layers pad asymmetrically (0,1)
    assert pads[0] == ((0, 1), (0, 1))
    # k5 s2 layers pad (1,2)
    assert pads[4] == ((1, 2), (1, 2))


def test_circular_pad_wraps_width_only():
    x = jnp.arange(2 * 3 * 4 * 1, dtype=jnp.float32).reshape(1, 2, 3, 4).transpose(0, 3, 1, 2)
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    y = pad_same(x, (1, 1), (1, 1), circular=True)
    assert y.shape == (1, 5, 6, 1)
    # width wraps
    np.testing.assert_array_equal(y[0, 1:-1, 0, 0], x[0, :, -1, 0])
    np.testing.assert_array_equal(y[0, 1:-1, -1, 0], x[0, :, 0, 0])
    # height zero-padded
    assert float(jnp.abs(y[0, 0]).sum()) == 0.0
    assert float(jnp.abs(y[0, -1]).sum()) == 0.0


def test_zero_pad_matches_numpy():
    x = jnp.ones((1, 4, 4, 2))
    y = pad_same(x, (0, 1), (1, 2), circular=False)
    assert y.shape == (1, 5, 7, 2)
    assert float(y.sum()) == float(x.sum())
