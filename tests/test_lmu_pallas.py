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


@pytest.mark.parametrize("cskip,strip", [(3, 4), (0, 4), (3, 8)])
def test_bwd_kernel_matches_reference_grads(cskip, strip):
    """fused_stage_bwd_pallas (one-pass backward, in-kernel h/g recompute,
    VMEM weight-grad accumulation across the grid) vs jax.grad of the jnp
    reference chain."""
    from ccvpe_tpu.ops.lmu_pallas import fused_stage_bwd_pallas

    rng = np.random.default_rng(7)
    x, skip, ws = _case(rng, 2, 8, 16, 7, 5, cskip, 6, 2)
    dy = _mk(rng, 2, 16, 32, 2)

    args = (x, skip, *ws) if cskip else (x, *ws)

    def loss(*a):
        if cskip:
            xx, ss, *w = a
        else:
            (xx, *w), ss = a, None
        return jnp.sum(fused_stage_reference(xx, ss, *w) * dy)

    ref_grads = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    got = fused_stage_bwd_pallas(x, skip if cskip else None, dy, *ws,
                                 strip=strip, interpret=True)
    dx, dskip, dwd, dbd, dw1, db1, dw2, db2 = got
    if cskip:
        rdx, rdskip, rdwd, rdbd, rdw1, rdb1, rdw2, rdb2 = ref_grads
        np.testing.assert_allclose(np.asarray(dskip), np.asarray(rdskip),
                                   atol=2e-4, rtol=2e-4)
    else:
        rdx, rdwd, rdbd, rdw1, rdb1, rdw2, rdb2 = ref_grads
        assert dskip is None
    for a, b in [(dx, rdx), (dwd, rdwd), (dbd, rdbd), (dw1, rdw1),
                 (db1, rdb1), (dw2, rdw2), (db2, rdb2)]:
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-4)


def test_fused_stage_diff_pallas_bwd_end_to_end():
    """grad through fused_stage_diff with bwd_impl='pallas' == reference."""
    from ccvpe_tpu.ops.lmu_pallas import fused_stage_diff

    rng = np.random.default_rng(8)
    x, skip, ws = _case(rng, 1, 8, 8, 5, 4, 3, 6, 2)

    def loss_k(x, skip, *ws):
        return jnp.sum(fused_stage_diff(x, skip, *ws, 4, True, "pallas") ** 2)

    def loss_r(x, skip, *ws):
        return jnp.sum(fused_stage_reference(x, skip, *ws) ** 2)

    gk = jax.grad(loss_k, argnums=tuple(range(8)))(x, skip, *ws)
    gr = jax.grad(loss_r, argnums=tuple(range(8)))(x, skip, *ws)
    for a, b in zip(gk, gr):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-4)


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
