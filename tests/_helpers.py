"""Shared test helpers."""

import jax
import numpy as np


def raw_ori_norm(model, variables, grd, sat):
    """Norm map of the PRE-normalization ori head output [B, H, W, 1].

    The model's `ori` output is the L2-NORMALIZED (cos, sin) head field
    (models/cvm.py:139); at pixels where the raw head vector is near zero,
    normalization amplifies benign float noise (SPMD reduction order, layout
    differences) unboundedly. Comparisons must therefore be norm-aware."""
    _, inter = model.apply(
        variables, grd, sat, False,
        capture_intermediates=lambda mdl, _: mdl.name == "ori_head")
    raw = np.asarray(jax.tree.leaves(inter["intermediates"])[0])
    return np.linalg.norm(raw, axis=-1, keepdims=True)


def assert_ori_close(ori_a, ori_b, raw_norm, atol=1e-4, floor=1e-2,
                     degenerate_atol=5e-2):
    """Strict comparison where the raw head norm has signal; loose direction
    match at degenerate (near-zero-norm) pixels."""
    ori_a, ori_b = np.asarray(ori_a), np.asarray(ori_b)
    well_posed = np.broadcast_to(raw_norm > floor, ori_a.shape)
    np.testing.assert_allclose(ori_a[well_posed], ori_b[well_posed],
                               atol=atol)
    np.testing.assert_allclose(ori_a, ori_b, atol=degenerate_atol)
