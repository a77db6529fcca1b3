"""Phase-space (space-to-depth) fine-stage ops == fine-layout ops.

The packed deconv/conv formulations (ccvpe_tpu/ops/phase_space.py) must
compute the exact tap set of the reference fine-layout stage (reference
models.py:108-127: ConvTranspose2d(2,2) -> skip concat -> double_conv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvpe_tpu.ops.phase_space import (conv3x3_packed, deconv2x2_packed,
                                       depth_to_space, phase_stage,
                                       space_to_depth)


def fine_conv3x3(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b


def fine_deconv(x, k, b):
    bsz, h, w, c = x.shape
    y = jnp.einsum("bhwc,ijco->bhiwjo", x, k,
                   preferred_element_type=jnp.float32)
    return y.reshape(bsz, 2 * h, 2 * w, k.shape[-1]) + b


def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(
        depth_to_space(space_to_depth(x), 5), x)


def test_deconv_packed_matches_fine(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 9)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 9, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    packed = deconv2x2_packed(x, k, b)
    np.testing.assert_allclose(depth_to_space(packed, 5),
                               fine_deconv(x, k, b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["onebig", "phase4"])
@pytest.mark.parametrize("hw,cin,cout", [((6, 8), 7, 5), ((4, 4), 3, 11)])
def test_conv3x3_packed_matches_fine(rng, impl, hw, cin, cout):
    h, w = hw
    fine = jnp.asarray(
        rng.normal(size=(2, 2 * h, 2 * w, cin)).astype(np.float32))
    wt = jnp.asarray(
        rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    packed = conv3x3_packed(space_to_depth(fine), wt, b, impl=impl)
    np.testing.assert_allclose(
        depth_to_space(packed, cout), fine_conv3x3(fine, wt, b),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["onebig", "phase4"])
def test_conv3x3_packed_split_skip_layout(rng, impl):
    """Packed input [4*cd deconv | 4*cs skip] + kernel-side interleave ==
    fine conv on the channel-concatenated fine map."""
    cd, cs, cout, h, w = 5, 3, 6, 4, 6
    fine_d = jnp.asarray(
        rng.normal(size=(2, 2 * h, 2 * w, cd)).astype(np.float32))
    fine_s = jnp.asarray(
        rng.normal(size=(2, 2 * h, 2 * w, cs)).astype(np.float32))
    wt = jnp.asarray(
        rng.normal(size=(3, 3, cd + cs, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    z = jnp.concatenate([space_to_depth(fine_d), space_to_depth(fine_s)],
                        axis=-1)
    packed = conv3x3_packed(z, wt, b, cd=cd, cs=cs, impl=impl)
    ref = fine_conv3x3(jnp.concatenate([fine_d, fine_s], -1), wt, b)
    np.testing.assert_allclose(depth_to_space(packed, cout), ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["onebig", "phase4"])
@pytest.mark.parametrize("with_skip", [True, False])
def test_phase_stage_matches_fine_chain(rng, impl, with_skip):
    cin, cd, cs, cout, h, w = 9, 6, 4 if with_skip else 0, 5, 4, 6
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    skip = (jnp.asarray(
        rng.normal(size=(2, 2 * h, 2 * w, cs)).astype(np.float32))
        if with_skip else None)
    dk = jnp.asarray(rng.normal(size=(2, 2, cin, cd)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(cd,)).astype(np.float32))
    wa = jnp.asarray(
        rng.normal(size=(3, 3, cd + cs, cout)).astype(np.float32))
    ba = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    wb = jnp.asarray(rng.normal(size=(3, 3, cout, cout)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    got = phase_stage(x, skip, dk, db, wa, ba, wb, bb,
                      dtype=jnp.float32, impl=impl)

    ref = fine_deconv(x, dk, db)
    if with_skip:
        ref = jnp.concatenate([ref, skip], axis=-1)
    ref = fine_conv3x3(jax.nn.relu(fine_conv3x3(ref, wa, ba)), wb, bb)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_phase_stage_deconv_only(rng):
    """Final-stage variant: deconv only, packed result for the head."""
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 7)).astype(np.float32))
    dk = jnp.asarray(rng.normal(size=(2, 2, 7, 3)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    packed = phase_stage(x, None, dk, db, None, None, None, None,
                         dtype=jnp.float32, unpack=False)
    np.testing.assert_allclose(depth_to_space(packed, 3),
                               fine_deconv(x, dk, db), rtol=1e-5, atol=1e-5)


def test_phase_stage_grads_match(rng):
    """Autodiff through the packed formulation == fine-layout grads."""
    cin, cd, cs, cout, h, w = 5, 4, 3, 4, 4, 4
    x = jnp.asarray(rng.normal(size=(1, h, w, cin)).astype(np.float32))
    skip = jnp.asarray(
        rng.normal(size=(1, 2 * h, 2 * w, cs)).astype(np.float32))
    dk = jnp.asarray(rng.normal(size=(2, 2, cin, cd)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(cd,)).astype(np.float32))
    wa = jnp.asarray(
        rng.normal(size=(3, 3, cd + cs, cout)).astype(np.float32))
    ba = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    wb = jnp.asarray(rng.normal(size=(3, 3, cout, cout)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    def loss_phase(x, dk, wa, wb):
        return jnp.sum(jnp.sin(phase_stage(
            x, skip, dk, db, wa, ba, wb, bb, dtype=jnp.float32)))

    def loss_fine(x, dk, wa, wb):
        y = fine_deconv(x, dk, db)
        y = jnp.concatenate([y, skip], axis=-1)
        y = fine_conv3x3(jax.nn.relu(fine_conv3x3(y, wa, ba)), wb, bb)
        return jnp.sum(jnp.sin(y))

    gp = jax.grad(loss_phase, argnums=(0, 1, 2, 3))(x, dk, wa, wb)
    gf = jax.grad(loss_fine, argnums=(0, 1, 2, 3))(x, dk, wa, wb)
    for a, b in zip(gp, gf):
        # f32 reassociation through two stacked convs + chain rule; the
        # forward tests above hold 1e-4 — grads only accumulate more terms.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# model-level wiring (ModelConfig.phase_space_min_res)
# ---------------------------------------------------------------------------

import dataclasses

from ccvpe_tpu.core import config as cfg_lib
from ccvpe_tpu.models.cvm import CVM

# compile-heavy parity/equivalence suites: full-lane only (the op-level
# variants stay in the fast lane via test_lmu_pallas/test_corr)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_pair():
    base = cfg_lib.tiny()
    phased = dataclasses.replace(base, phase_space_min_res=32)
    r = np.random.default_rng(11)
    grd = jnp.asarray(r.normal(size=(2, *base.grd_size, 3)).astype(np.float32))
    sat = jnp.asarray(r.normal(size=(2, *base.sat_size, 3)).astype(np.float32))
    return base, phased, grd, sat


def test_model_param_tree_identical(tiny_pair):
    base, phased, grd, sat = tiny_pair
    key = jax.random.PRNGKey(17)
    vb = CVM(base).init(key, grd[:1], sat[:1])
    vp = CVM(phased).init(key, grd[:1], sat[:1])
    pb, _ = jax.tree_util.tree_flatten_with_path(vb["params"])
    pf, _ = jax.tree_util.tree_flatten_with_path(vp["params"])
    assert [p for p, _ in pb] == [p for p, _ in pf]
    for (path, a), (_, b) in zip(pb, pf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_model_forward_matches_unphased(tiny_pair):
    base, phased, grd, sat = tiny_pair
    variables = CVM(base).init(jax.random.PRNGKey(17), grd[:1], sat[:1])
    out_b = CVM(base).apply(variables, grd, sat)
    out_p = CVM(phased).apply(variables, grd, sat)
    np.testing.assert_allclose(np.asarray(out_p.heatmap),
                               np.asarray(out_b.heatmap), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.logits),
                               np.asarray(out_b.logits), atol=2e-4)
    from tests._helpers import assert_ori_close, raw_ori_norm
    rn = raw_ori_norm(CVM(base), variables, grd, sat)
    assert_ori_close(np.asarray(out_p.ori), np.asarray(out_b.ori), rn,
                     atol=2e-4)
    for sp, sb in zip(out_p.matching_scores, out_b.matching_scores):
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sb), atol=2e-4)


def test_model_grads_match_unphased(tiny_pair):
    base, phased, grd, sat = tiny_pair
    variables = CVM(base).init(jax.random.PRNGKey(17), grd[:1], sat[:1])
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(cfg):
        def f(p):
            out = CVM(cfg).apply({"params": p, **rest}, grd, sat)
            return (jnp.mean(out.heatmap ** 2) * 1e4
                    + jnp.mean(out.ori ** 2)
                    + sum(jnp.mean(s ** 2) for s in out.matching_scores))
        return f

    gb = jax.grad(loss(base))(params)
    gp = jax.grad(loss(phased))(params)
    flat_b = jax.tree_util.tree_flatten_with_path(gb)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (path, a), (_, b) in zip(flat_b, flat_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=str(path))
