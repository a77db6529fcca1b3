"""Pallas TPU kernel: fused orientation-rolled correlation.

Fuses the two matmuls of ccvpe_tpu/ops/corr.py (numerator vs. rolled
descriptors, squared-norm vs. rolled masks) plus the rsqrt-normalize into a
single pass over the sat descriptor map: S is read from HBM exactly once
(the XLA path reads it twice), making this HBM-bandwidth-optimal for the
memory-bound fine decoder scales.

The ground-norm division is folded into the descriptor matrix outside the
kernel (G' = G / ||g||, built in differentiable jnp), so the kernel is just:

    num[t,k]  = sum_d S[t,d] * G'[k,d]         (MXU)
    den2[t,k] = sum_d S[t,d]^2 * M[k,d]        (MXU, same S tile)
    out[t,k]  = num * rsqrt(den2)              (VPU)

Training support: custom VJP with an MXU-matmul backward in plain XLA
(gradients flow to S and G'; M is a constant mask).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(s_ref, g_ref, m_ref, out_ref, r_ref, *, combine):
    s = s_ref[0]                       # [T, D]
    g = g_ref[0]                       # [K, D]
    m = m_ref[:]                       # [K, D]
    if combine:
        # D < 128: the MXU pads the contraction dim to 128 anyway, so stack
        # [s | s^2] on the (padded-for-free) lane dim and [G'; M] on the
        # contraction dim - ONE matmul produces num and den2 side by side at
        # the cost the padded num-matmul alone would have.
        k, d = m.shape
        a = jnp.concatenate([s, s * s], axis=1)            # [T, 2D]
        z = jnp.zeros((k, d), g.dtype)
        b_mat = jnp.concatenate([
            jnp.concatenate([g, z], axis=1),               # num row-block
            jnp.concatenate([z, m], axis=1),               # den row-block
        ], axis=0)                                         # [2K, 2D]
        both = jax.lax.dot_general(
            a, b_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [T, 2K]
        num, den2 = both[:, :k], both[:, k:]
    else:
        num = jax.lax.dot_general(
            s, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        den2 = jax.lax.dot_general(
            s * s, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    r = jax.lax.rsqrt(den2)
    out_ref[0] = num * r
    r_ref[0] = r


def _pick_tile(n: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


def _corr_fwd_pallas(s_flat: jnp.ndarray, g_mat: jnp.ndarray, m_mat: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s_flat [B,N,D], g_mat [B,K,D] (already /||g||), m_mat [K,D]
    -> (scores [B,N,K], r [B,N,K])."""
    b, n, d = s_flat.shape
    k = g_mat.shape[1]
    t = _pick_tile(n)
    grid = (b, n // t)

    flops = 2 * b * n * d * k * 2
    bytes_accessed = 4 * (b * n * d + b * k * d + k * d + 2 * b * n * k)

    # combine num+den into one matmul when both stacked dims still fit one
    # MXU pass (D < 128 contraction, 2K <= 128 output)
    combine = d < 128 and 2 * k <= 128

    out, r = pl.pallas_call(
        functools.partial(_corr_kernel, combine=combine),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * n * k),
    )(s_flat, g_mat, m_mat)
    return out, r


@jax.custom_vjp
def corr_core(s_flat, g_mat, m_mat):
    out, _ = _corr_fwd_pallas(s_flat, g_mat, m_mat)
    return out


def _corr_core_fwd(s_flat, g_mat, m_mat):
    out, r = _corr_fwd_pallas(s_flat, g_mat, m_mat)
    return out, (s_flat, g_mat, m_mat, out, r)


def _corr_core_bwd(res, gbar):
    s, g_mat, m_mat, score, r = res
    a = gbar * r                                       # [B,N,K]
    c = gbar * score * (r * r)                         # [B,N,K]
    # d out / d s = r*G - s * (out * r^2 * M)
    grad_s = jnp.einsum("bnk,bkd->bnd", a, g_mat,
                        preferred_element_type=jnp.float32)
    grad_s = grad_s - s * jnp.einsum("bnk,kd->bnd", c, m_mat,
                                     preferred_element_type=jnp.float32)
    grad_g = jnp.einsum("bnk,bnd->bkd", a, s,
                        preferred_element_type=jnp.float32)
    return grad_s, grad_g, jnp.zeros_like(m_mat)


corr_core.defvjp(_corr_core_fwd, _corr_core_bwd)


def rolled_corr_pallas(sat: jnp.ndarray, grd: jnp.ndarray, shift: int,
                       num_bins: int, center: bool = False, bins=None
                       ) -> jnp.ndarray:
    """Drop-in replacement for ops.corr.rolled_corr on TPU."""
    from ccvpe_tpu.ops.corr import build_roll_matrices

    if bins is None:
        bins = tuple(range(num_bins))
    bins = tuple(bins)
    sat = sat.astype(jnp.float32)   # cosine scores are precision-sensitive
    grd = grd.astype(jnp.float32)
    b, h, w, d = sat.shape
    g_mat, m_mat = build_roll_matrices(grd, d, shift, bins, center)
    g_norm = jnp.linalg.norm(grd, axis=-1)
    g_mat = g_mat / g_norm[:, None, None]
    s_flat = sat.reshape(b, h * w, d)
    out = corr_core(s_flat, g_mat, m_mat)
    return out.reshape(b, h, w, len(bins))
