"""Fused LMU-stage Pallas kernel vs the jnp reference (interpret mode on
CPU; on-chip parity is covered by tools/bench_lmu.py device runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.ops.lmu_pallas import (depth_to_space, fused_stage,
                                      fused_stage_reference)


def _mk(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)


def _case(rng, b, hc, wc, cin, cd, cskip, c1, cout):
    x = _mk(rng, b, hc, wc, cin)
    skip = _mk(rng, b, 2 * hc, 2 * wc, cskip) if cskip else None
    wd = _mk(rng, 2, 2, cin, cd)
    bd = _mk(rng, cd)
    w1 = _mk(rng, 3, 3, cd + cskip, c1)
    b1 = _mk(rng, c1)
    w2 = _mk(rng, 3, 3, c1, cout)
    b2 = _mk(rng, cout)
    return x, skip, (wd, bd, w1, b1, w2, b2)


@pytest.mark.parametrize("cskip,strip", [(3, 4), (0, 4), (3, 8), (0, 2)])
def test_fused_stage_matches_reference(cskip, strip):
    rng = np.random.default_rng(0)
    x, skip, ws = _case(rng, 2, 8, 16, 7, 5, cskip, 6, 2)
    ref = fused_stage_reference(x, skip, *ws)
    out = fused_stage(x, skip, *ws, strip=strip, interpret=True)
    assert out.shape == ref.shape == (2, 16, 32, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_stage_stage6_geometry():
    """The head-stage shape (deconv 41->16, conv 16->16 -> relu -> 16->1,
    no skip) at a miniature spatial size."""
    rng = np.random.default_rng(1)
    x, skip, ws = _case(rng, 1, 8, 32, 41, 16, 0, 16, 1)
    ref = fused_stage_reference(x, None, *ws)
    out = fused_stage(x, None, *ws, strip=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_stage_bf16():
    rng = np.random.default_rng(2)
    x, skip, ws = _case(rng, 1, 8, 16, 9, 8, 4, 8, 3)
    x16 = x.astype(jnp.bfloat16)
    skip16 = skip.astype(jnp.bfloat16)
    ref = fused_stage_reference(x16.astype(jnp.float32),
                                skip16.astype(jnp.float32), *ws)
    out = fused_stage(x16, skip16, *ws, strip=4, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_depth_to_space_layout():
    """Channel (di*2+dj)*Cout + c of the phase tensor lands at fine pixel
    (2i+di, 2j+dj, c)."""
    b, h, w, cout = 1, 2, 3, 2
    vals = np.arange(b * h * w * 4 * cout, dtype=np.float32).reshape(
        b, h, w, 4 * cout)
    out = np.asarray(depth_to_space(jnp.asarray(vals), cout))
    for i in range(h):
        for j in range(w):
            for di in range(2):
                for dj in range(2):
                    for c in range(cout):
                        assert out[0, 2 * i + di, 2 * j + dj, c] == \
                            vals[0, i, j, (di * 2 + dj) * cout + c]
