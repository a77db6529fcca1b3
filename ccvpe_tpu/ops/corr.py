"""Orientation-rolled descriptor correlation as batched MXU matmuls.

The reference computes, per orientation bin i, per pixel (y,x):

    window_i = roll(sat_map, -i*shift, channel)[:L]            # 'first' mode
             | roll(sat_map, -i*shift, channel)[D/2-L/2:D/2+L/2]  # 'center'
    score_i  = <grd, window_i> / (||window_i|| * ||grd||)

with a Python loop over bins (reference models.py:191-202 and 5 further
per-scale loops; center-window at models.py:1094; restricted bin range for the
orientation prior at models.py:489-499).

TPU-first reformulation: window_i[c] = S[(off + c + i*shift) mod D], so with
the ground descriptor zero-embedded at channel offset `off` into length D,

    numerator_i   = sum_d roll(g_pad, +i*shift)[d] * S[d]
    ||window_i||^2 = sum_d roll(m_pad, +i*shift)[d] * S[d]^2

i.e. ALL bins at once are two matmuls against small [K, D] matrices built by K
static rolls of a length-D vector. XLA maps both straight onto the MXU; no
per-bin loop, no gather, S is read once per matmul. A Pallas kernel
(ccvpe_tpu/ops/corr_pallas.py) further fuses numerator, norm and the division
into a single pass over S.

Shapes: sat [B, h, w, D] (NHWC), grd [B, L], output [B, h, w, K].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _window_offset(total: int, length: int, center: bool) -> int:
    """Channel offset of the matching window inside the rolled map.

    'first' mode -> 0 (models.py:193); 'center' -> int(D/2 - L/2)
    (models.py:1094).
    """
    return int(total / 2 - length / 2) if center else 0


def build_roll_matrices(
    grd: jnp.ndarray,
    total_dim: int,
    shift: int,
    bins: Sequence[int],
    center: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build G [B, K, D] (rolled zero-embedded descriptors) and M [K, D]
    (rolled window masks) for the given bin offsets."""
    b, length = grd.shape
    off = _window_offset(total_dim, length, center)
    g_pad = jnp.zeros((b, total_dim), grd.dtype).at[:, off:off + length].set(grd)
    m_pad = jnp.zeros((total_dim,), grd.dtype).at[off:off + length].set(1.0)
    # static rolls: K is small (<=20), D <= 2048
    g_mat = jnp.stack([jnp.roll(g_pad, k * shift, axis=-1) for k in bins], axis=1)
    m_mat = jnp.stack([jnp.roll(m_pad, k * shift, axis=-1) for k in bins], axis=0)
    return g_mat, m_mat


def rolled_corr(
    sat: jnp.ndarray,
    grd: jnp.ndarray,
    shift: int,
    num_bins: int,
    center: bool = False,
    bins: Optional[Sequence[int]] = None,
    eps: float = 0.0,
    ori_axis: Optional[str] = None,
    allow_bf16: bool = False,
) -> jnp.ndarray:
    """Cosine-similarity matching scores for all orientation bins.

    Args:
      sat: [B, h, w, D] sat descriptor map (channels last).
      grd: [B, L] ground descriptor, L <= D.
      shift: channel shift per bin (e.g. 64 at the VIGOR bottleneck,
        models.py:192; the KITTI level-6 quirk shift=8 is just passed in).
      num_bins: K (20 VIGOR/Oxford, 16 KITTI).
      center: Oxford centre-window mode.
      bins: explicit bin offsets (e.g. range(-n, n+1) for the orientation
        prior, models.py:489); default range(num_bins).
      eps: optional denominator epsilon (reference uses none).
      ori_axis: optional mesh axis name to shard the bin dimension over
        (orientation-axis parallelism, the CP analog of SURVEY.md 2.4).
        The [K, D] roll matrices and the [B, h, w, K] score volume are
        constrained to that axis; XLA SPMD then computes each device's bin
        block locally (sat stays replicated along the axis, no collective
        inside - downstream reduces over K insert the combine). Requires an
        ambient mesh (jax.set_mesh) carrying the axis.

      allow_bf16: keep bfloat16 einsum OPERANDS when sat arrives bf16
        (accumulation stays f32 via preferred_element_type) instead of
        upcasting - halves the read traffic of the fine-scale score inputs
        (the 256^2 x 40 / 128^2 x 80 maps, r3 verdict item 4). The bf16
        products are exact in the f32 accumulator (sat is already
        bf16-valued in the mixed-precision step), only the squared map for
        the denominator rounds once more (~2^-9 relative per term).
        Default off: f32 operands, the strict-parity path.

    Returns: [B, h, w, K] scores, K = len(bins) if given else num_bins.
    """
    if bins is None:
        bins = tuple(range(num_bins))
    keep_bf16 = allow_bf16 and sat.dtype == jnp.bfloat16
    grd = grd.astype(jnp.float32)
    g_norm = jnp.linalg.norm(grd, axis=-1)  # [B] (always f32)
    if keep_bf16:
        grd = grd.astype(jnp.bfloat16)
    else:
        sat = sat.astype(jnp.float32)  # cosine scores are precision-sensitive
    total_dim = sat.shape[-1]
    g_mat, m_mat = build_roll_matrices(grd, total_dim, shift, bins, center)
    if ori_axis is not None:
        from jax.sharding import PartitionSpec as P
        # Pin ONLY the bin dim; leave batch/feature dims UNCONSTRAINED so
        # the propagated batch sharding (g_mat inherits it from the
        # data-sharded grd) survives. P(None, ...) would force the batch dim
        # REPLICATED, conflicting with the propagated {data}-sharding - the
        # source of the r2 dryrun's GSPMD "involuntary full
        # rematerialization" warnings on every g_mat concatenate.
        u = P.UNCONSTRAINED
        g_mat = jax.lax.with_sharding_constraint(g_mat, P(u, ori_axis, u))
        m_mat = jax.lax.with_sharding_constraint(m_mat, P(ori_axis, u))
    # accumulate in f32 on the MXU
    num = jnp.einsum("bhwd,bkd->bhwk", sat, g_mat,
                     preferred_element_type=jnp.float32)
    den_sq = jnp.einsum("bhwd,kd->bhwk", jnp.square(sat), m_mat,
                        preferred_element_type=jnp.float32)
    den = jnp.sqrt(den_sq) * g_norm[:, None, None, None]
    out = num / (den + eps)
    if ori_axis is not None:
        from jax.sharding import PartitionSpec as P
        u = P.UNCONSTRAINED
        out = jax.lax.with_sharding_constraint(out, P(u, u, u, ori_axis))
    return out


def rolled_corr_dispatch(
    sat: jnp.ndarray,
    grd: jnp.ndarray,
    shift: int,
    num_bins: int,
    center: bool = False,
    bins: Optional[Sequence[int]] = None,
    impl: str = "auto",
    ori_axis: Optional[str] = None,
    allow_bf16: bool = False,
) -> jnp.ndarray:
    """Select the fused Pallas kernel on TPU backends, the XLA matmul
    formulation elsewhere (CPU tests, interpret-unfriendly contexts).

    auto: Pallas only when the channel dim fills the 128-wide VMEM lane tile
    (D >= 128); for the fine decoder scales (D = 40..80) the padding waste
    makes XLA's fused einsum faster (measured on v5e).

    ori_axis (orientation-bin sharding) forces the XLA path: the sharding
    constraints let GSPMD partition the einsums over bins, whereas the Pallas
    kernel is a single-device program with no partition rule registered.
    """
    if ori_axis is not None:
        return rolled_corr(sat, grd, shift, num_bins, center, bins,
                           ori_axis=ori_axis, allow_bf16=allow_bf16)
    if impl == "auto":
        if jax.default_backend() == "cpu" or sat.shape[-1] < 128:
            impl = "xla"
        else:
            impl = "pallas"
    if impl == "pallas":
        from ccvpe_tpu.ops.corr_pallas import rolled_corr_pallas
        return rolled_corr_pallas(sat, grd, shift, num_bins, center, bins)
    return rolled_corr(sat, grd, shift, num_bins, center, bins,
                       allow_bf16=allow_bf16)


def rolled_corr_bin_sharded(
    sat: jnp.ndarray,
    grd: jnp.ndarray,
    shift: int,
    num_bins: int,
    mesh,
    axis: str = "model",
    center: bool = False,
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Orientation-axis sharded correlation via explicit shard_map (the
    context-parallel analog, SURVEY.md 2.4): each device along `axis` owns a
    contiguous block of orientation bins, i.e. a row-block of the [K, D] roll
    matrices. The sat map and ground descriptor stay replicated along `axis`;
    bins are independent, so no collective is needed inside — the output
    [B, h, w, K] simply comes back sharded on K along `axis`.

    This is the explicit-collective formulation of what ModelConfig.ori_axis
    does inside the model via sharding constraints (rolled_corr(ori_axis=...),
    which GSPMD partitions the same way); kept as the standalone scale-out
    path and as a cross-check of the compiler-partitioned one.

    This matters when K*h*w score volumes dominate memory (many bins / fine
    orientation resolution): each device materializes only K/axis_size bins.
    For the reference's K<=20 the folded [K, D] matmul (rolled_corr) is
    already optimal on one chip.

    batch_axis: mesh axis the batch dim is sharded over, or None if the
    batch is replicated.
    """
    from jax.sharding import PartitionSpec as P

    axis_size = mesh.shape[axis]
    if num_bins % axis_size:
        raise ValueError(f"num_bins={num_bins} not divisible by "
                         f"mesh axis '{axis}' of size {axis_size}")
    sat = sat.astype(jnp.float32)
    grd = grd.astype(jnp.float32)
    g_mat, m_mat = build_roll_matrices(
        grd, sat.shape[-1], shift, tuple(range(num_bins)), center)
    g_norm = jnp.linalg.norm(grd, axis=-1)

    def local(sat_l, g_l, m_l, gn_l):
        num = jnp.einsum("bhwd,bkd->bhwk", sat_l, g_l,
                         preferred_element_type=jnp.float32)
        den_sq = jnp.einsum("bhwd,kd->bhwk", jnp.square(sat_l), m_l,
                            preferred_element_type=jnp.float32)
        return num / (jnp.sqrt(den_sq) * gn_l[:, None, None, None])

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis), P(batch_axis, axis, None), P(axis, None),
                  P(batch_axis)),
        out_specs=P(batch_axis, None, None, axis),
    )
    return fn(sat, g_mat, m_mat, g_norm)


def rolled_corr_reference(
    sat: jnp.ndarray,
    grd: jnp.ndarray,
    shift: int,
    num_bins: int,
    center: bool = False,
    bins: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Direct transcription of the reference loop semantics (roll + slice +
    norms), used only to test the matmul formulation. [B,h,w,K] out."""
    if bins is None:
        bins = tuple(range(num_bins))
    b, h, w, d = sat.shape
    length = grd.shape[-1]
    off = _window_offset(d, length, center)
    g_norm = jnp.linalg.norm(grd, axis=-1)[:, None, None]
    out = []
    for k in bins:
        rolled = jnp.roll(sat, -k * shift, axis=-1)
        window = rolled[..., off:off + length]
        den = jnp.linalg.norm(window, axis=-1) * g_norm
        num = jnp.einsum("bhwc,bc->bhw", window, grd)
        out.append(num / den)
    return jnp.stack(out, axis=-1)
