"""Rolled-correlation op: matmul formulation vs. reference roll-loop semantics
(reference models.py:191-202, :1094 center window, :489 restricted bins,
:910 KITTI level-6 shift quirk)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.ops.corr import rolled_corr, rolled_corr_reference

CASES = [
    # (B, h, w, D, L, shift, K, center) - all reference configurations
    (2, 8, 8, 1280, 1280, 64, 20, False),   # VIGOR bottleneck
    (1, 16, 16, 640, 640, 32, 20, False),   # VIGOR scale 2
    (2, 8, 8, 2048, 512, 128, 16, False),   # KITTI bottleneck
    (1, 4, 4, 32, 32, 8, 16, False),        # KITTI level-6: shift 8 wraps at 4 bins
    (2, 8, 8, 1280, 224, 64, 20, True),     # Oxford bottleneck centre window
    (1, 8, 8, 40, 7, 2, 20, True),          # Oxford finest scale
]


@pytest.mark.parametrize("case", CASES)
def test_matmul_matches_roll_loop(case, rng):
    b, h, w, d, l, shift, k, center = case
    sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(b, l)).astype(np.float32))
    fast = rolled_corr(sat, grd, shift, k, center)
    ref = rolled_corr_reference(sat, grd, shift, k, center)
    assert fast.shape == (b, h, w, k)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_restricted_bins(rng):
    sat = jnp.asarray(rng.normal(size=(1, 8, 8, 1280)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(1, 1280)).astype(np.float32))
    bins = tuple(range(-3, 4))  # ori_noise = 54 deg -> n = 3
    fast = rolled_corr(sat, grd, 64, 20, bins=bins)
    ref = rolled_corr_reference(sat, grd, 64, 20, bins=bins)
    assert fast.shape[-1] == 7
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_roll_equals_rotation(rng):
    """Rolling the ground descriptor by one bin's worth of channels shifts the
    score argmax by one bin - the property that makes channel-roll equal
    image-space rotation (SURVEY.md 2.3.1)."""
    d, shift, k = 1280, 64, 20
    sat = jnp.asarray(rng.normal(size=(1, 4, 4, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))
    s0 = rolled_corr(sat, grd, shift, k)
    s1 = rolled_corr(sat, jnp.roll(grd, -shift, axis=-1), shift, k)
    # g'[c] = g[(c+shift) % D]  =>  score_k(g') == score_{k-1}(g)
    np.testing.assert_allclose(
        np.asarray(s1[..., 1:]), np.asarray(s0[..., :-1]), atol=2e-5
    )


def test_bin_sharded_matches_unsharded(rng):
    """Orientation-axis (CP-analog) sharding: bins split over the 'model'
    mesh axis must give the same scores as the folded single-device matmul
    (SURVEY.md 2.4 orientation-axis parallelism)."""
    from ccvpe_tpu.core.mesh import make_mesh
    from ccvpe_tpu.ops.corr import rolled_corr_bin_sharded

    b, h, w, d, shift, k = 2, 8, 8, 1280, 64, 20
    sat = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    ref = rolled_corr(sat, grd, shift, k)

    mesh = make_mesh(data=2, model=4)  # 20 bins -> 5 per device
    sharded = rolled_corr_bin_sharded(sat, grd, shift, k, mesh)
    assert sharded.shape == (b, h, w, k)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), atol=2e-5)

    with pytest.raises(ValueError):
        rolled_corr_bin_sharded(sat, grd, shift, 18, mesh)

    # replicated-batch variant (batch_axis=None)
    repl = rolled_corr_bin_sharded(sat, grd, shift, k, mesh, batch_axis=None)
    np.testing.assert_allclose(np.asarray(repl), np.asarray(ref), atol=2e-5)


def test_scores_are_cosines(rng):
    sat = jnp.asarray(rng.normal(size=(1, 4, 4, 256)).astype(np.float32))
    grd = jnp.asarray(rng.normal(size=(1, 256)).astype(np.float32))
    s = np.asarray(rolled_corr(sat, grd, 64, 4))
    assert np.all(s <= 1 + 1e-5) and np.all(s >= -1 - 1e-5)
    # bin 0 with L = D is plain cosine similarity
    cos = np.asarray(
        jnp.einsum("bhwc,bc->bhw", sat, grd)
        / (jnp.linalg.norm(sat, axis=-1) * jnp.linalg.norm(grd, axis=-1)[:, None, None])
    )
    np.testing.assert_allclose(s[..., 0], cos, atol=2e-5)


def test_rolled_corr_allow_bf16_close_to_f32():
    """allow_bf16 (r4: bf16 einsum operands, f32 accumulation) must track
    the f32 path within bf16 input-rounding tolerance - the operands are
    already bf16-valued in the mixed-precision step, so the only extra
    rounding is the squared map for the denominator."""
    import jax.numpy as jnp

    from ccvpe_tpu.ops.corr import rolled_corr

    r = np.random.default_rng(5)
    sat = jnp.asarray(r.normal(size=(2, 8, 8, 40)).astype(np.float32))
    grd = jnp.asarray(r.normal(size=(2, 40)).astype(np.float32))
    ref = rolled_corr(sat, grd, shift=2, num_bins=20)
    got = rolled_corr(sat.astype(jnp.bfloat16), grd, shift=2, num_bins=20,
                      allow_bf16=True)
    assert got.dtype == jnp.float32
    # unit-scale cosine scores; bf16 inputs round at ~2^-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=8e-3)
    # and with f32 inputs the flag must be a no-op (strict parity)
    same = rolled_corr(sat, grd, shift=2, num_bins=20, allow_bf16=True)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(ref))
