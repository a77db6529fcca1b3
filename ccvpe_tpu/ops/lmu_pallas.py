"""Fused LMU decoder stage as Pallas TPU kernels (forward AND backward).

One reference LMU stage (models.py:108-127 defs, :204-341 fwd) is
    y = conv_b( relu( conv_a( concat([deconv2x2(x), skip]) ) ) )
with conv_a/conv_b 3x3 pad-1 (double_conv, models.py:42-47; the final
stage + head conv, models.py:125-127, has the same shape with skip=None).

Why a kernel: at the fine decoder scales (C = 16..56 at 256^2/512^2) XLA's
conv emitter re-reads the input once per kernel tap with batch-padded lane
layouts - measured ~77-90 GB/s effective at batch 64 (tools/bench_layout.py),
i.e. ~10x the logical bytes moved per conv. These kernels read x (and skip)
ONCE per strip into VMEM, keep the deconv output and the conv_a
intermediate entirely on-chip, and write only the final y (forward) or the
input/weight gradients (backward) - the 2x-resolution intermediates never
touch HBM.

Layout strategy ("phase space"): the 2x2-stride-2 deconv has zero overlap,
so the fine map decomposes into 4 coarse-resolution phase planes
h[di][dj] = x @ wd[di, dj] - pure MXU matmuls, no interleaving. The 3x3
convs are evaluated per OUTPUT phase as 9 tap-matmuls against coarse-shifted
phase planes (fine shift dy maps to phase (pi+dy-1) mod 2 and coarse row
shift (pi+dy-1)//2 in {-1, 0, 1}). The skip connection is phase-split in
XLA (`_phase_major`; the packed-channel equivalent lives in
ops/phase_space.py::space_to_depth) and fed as 4 coarse planes; instead of concatenating
[deconv | skip] on the channel dim (an unaligned-lane concat Mosaic dislikes)
conv_a's weight matrix is SPLIT into its deconv rows and skip rows and the
two tap-matmul sets are summed - numerically identical.

Mosaic constraints that shaped the implementation (found on-chip):
  * manually-DMA'd HBM slices need 128-aligned lane dims -> all strip I/O
    uses BlockSpec pipelining (no alignment limit, ops/corr_pallas.py
    precedent) with halo COMPANION arrays (`_strip_halos`) instead of
    overlapping manual copies.
  * +-1 column (sublane) shifts for conv taps use `pltpu.roll` + an iota
    edge mask, not unaligned sublane slices.
  * per-phase outputs ([4, B, Hc, Wc, C] blocks) instead of an
    unaligned-lane channel concat; XLA recombines with one cheap
    reshape/transpose (`depth_to_space`).

Boundary semantics: conv pad-1 zero-pads the FINE maps. A fine halo row
outside the image must act as exactly zero - NOT as deconv(0)+bias - so the
kernels mask h (deconv output), the skip planes, and g (conv_a output) rows
that fall outside the image. x/skip are pre-padded by 2 coarse zero rows in
XLA so every strip block is a static partition.

Grid = (B, Hc // strip): one batch item x one strip of coarse rows per
step, with a 2-coarse-row halo (the receptive field of two stacked 3x3
convs at fine scale). The backward kernel additionally accumulates all
weight/bias gradients in VMEM across the (sequential on TPU) grid.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


# ---------------------------------------------------------------------------
# layout helpers (XLA side)
# ---------------------------------------------------------------------------

from ccvpe_tpu.ops.phase_space import (  # noqa: F401  (re-export)
    depth_to_space, space_to_depth)


def _phase_major(fine: jnp.ndarray) -> jnp.ndarray:
    """[B, 2H, 2W, C] -> [4, B, H, W, C] (phase-major planes)."""
    b, h2, w2_, c = fine.shape
    v = fine.reshape(b, h2 // 2, 2, w2_ // 2, 2, c)
    return v.transpose(2, 4, 0, 1, 3, 5).reshape(
        4, b, h2 // 2, w2_ // 2, c)


def _phase_major_to_fine(ph: jnp.ndarray) -> jnp.ndarray:
    """[4, B, H, W, C] -> [B, 2H, 2W, C] (inverse of `_phase_major`)."""
    q, b, h, w, c = ph.shape
    v = ph.reshape(2, 2, b, h, w, c).transpose(2, 3, 0, 4, 1, 5)
    return v.reshape(b, 2 * h, 2 * w, c)


def _strip_halos(tp: jnp.ndarray, strip: int, halo: int,
                 axis: int = 1) -> jnp.ndarray:
    """Halo companion of a row-padded tensor, for halo'd strip pipelining
    without manual DMA (Mosaic requires 128-aligned lane dims on manually
    DMA'd slices; BlockSpec pipelining has no such limit).

    Along `axis` (padded length H + 2*halo), returns length nstrips*2*halo
    where the 2*halo rows of strip ti are the strip's top halo rows
    [ti*strip, ti*strip + halo) followed by its bottom halo rows
    [ti*strip + strip + halo, ... + halo)."""
    tp = jnp.moveaxis(tp, axis, 0)
    hp = tp.shape[0]
    h = hp - 2 * halo
    n = h // strip
    tops = jnp.stack([tp[i::strip][:n] for i in range(halo)], axis=1)
    bots = jnp.stack([tp[strip + halo + i::strip][:n]
                      for i in range(halo)], axis=1)
    both = jnp.concatenate([tops, bots], axis=1)   # [n, 2*halo, ...]
    both = both.reshape(n * 2 * halo, *tp.shape[1:])
    return jnp.moveaxis(both, 0, axis)


def pad_rows(t: jnp.ndarray, halo: int, axis: int = 1) -> jnp.ndarray:
    cfg = [(0, 0)] * t.ndim
    cfg[axis] = (halo, halo)
    return jnp.pad(t, cfg)


# ---------------------------------------------------------------------------
# kernel-side helpers
# ---------------------------------------------------------------------------

def _row_mask(vals: jnp.ndarray, lo, hc: int) -> jnp.ndarray:
    """Zero rows of a [R, W, C] strip whose global coarse row lo+r is
    outside [0, hc). jnp.where (not multiply) so stale scratch NaNs can't
    leak through 0*NaN."""
    r = vals.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0) + lo
    ok = jnp.logical_and(rows >= 0, rows < hc)
    return jnp.where(ok, vals, jnp.zeros_like(vals))


def _col_variants(plane: jnp.ndarray) -> dict:
    """{sx: column-shifted plane} for sx in {-1, 0, 1}, zero-filled at the
    true image column edges: variant[sx][r, c] = plane[r, c + sx].

    Column shifts use pltpu.roll + an iota edge mask (unaligned sublane
    slices are not Mosaic-friendly); Mosaic implements rotate only for
    32-bit data, so bf16 planes round-trip through f32 (exact)."""
    r, w, c = plane.shape
    col = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
    p32 = plane.astype(F32)
    zero = jnp.zeros_like(p32)
    # roll wants shift >= 0: shift by c+sx -> rotate by (-sx) mod w
    right = jnp.where(col < w - 1, pltpu.roll(p32, w - 1, axis=1), zero)
    left = jnp.where(col >= 1, pltpu.roll(p32, 1, axis=1), zero)
    return {0: plane,
            1: right.astype(plane.dtype),
            -1: left.astype(plane.dtype)}


def _tap_shift(plane_vars: dict, sy: int, sx: int) -> jnp.ndarray:
    """result[r, c] = plane[r + 1 + sy, c + sx] for a [R, W, C] strip with a
    1-row halo top+bottom (returns R-2 rows); takes the `_col_variants` of
    the plane and row-slices the right one (major-dim slices only)."""
    plane = plane_vars[sx]
    r = plane.shape[0]
    return plane[1 + sy:r - 1 + sy]


def _conv3x3_phase(phases, w_taps, bias, out_dtype, extra=None):
    """3x3 pad-1 conv evaluated in phase space.

    phases[q][p]: [R, W, Cin] coarse strips WITH a 1-coarse-row halo
    top+bottom. w_taps: [3, 3, Cin, Cout]. extra: optional second
    (phases2, w_taps2) input set summed into the same output (the split
    [deconv | skip] channel concat). Returns 2x2 phase planes
    [R-2, W, Cout] (halo consumed)."""
    sets = [(phases, w_taps)]
    if extra is not None:
        sets.append(extra)
    var_sets = [([[_col_variants(phs[q][p]) for p in range(2)]
                  for q in range(2)], wt) for phs, wt in sets]
    outs = [[None, None], [None, None]]
    r_out = phases[0][0].shape[0] - 2
    w = phases[0][0].shape[1]
    for pi in range(2):
        for pj in range(2):
            acc = None
            for dy in range(3):
                q = (pi + dy - 1) % 2
                sy = (pi + dy - 1) // 2
                for dx in range(3):
                    p = (pj + dx - 1) % 2
                    sx = (pj + dx - 1) // 2
                    for vars_, wt in var_sets:
                        tap = _tap_shift(vars_[q][p], sy, sx)
                        cin = tap.shape[-1]
                        t = jax.lax.dot_general(
                            tap.reshape(r_out * w, cin), wt[dy, dx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=F32)
                        acc = t if acc is None else acc + t
            acc = acc + bias.astype(F32)
            outs[pi][pj] = acc.reshape(r_out, w, -1).astype(out_dtype)
    return outs


def _conv3x3_wgrad(in_phases, dout_phases, w_shape):
    """Weight gradient of the phase-space 3x3 pad-1 conv.

    in_phases[q][p]: [R, W, Cin] strips WITH a 1-row halo top+bottom;
    dout_phases[pi][pj]: [R-2, W, Cout] TRUE rows only (each fine output
    position counted exactly once across strips). Returns [3, 3, Cin, Cout]
    f32 - the same tap/phase index mapping as `_conv3x3_phase`."""
    r_out, w = dout_phases[0][0].shape[:2]
    cin, cout = w_shape
    in_vars = [[_col_variants(in_phases[q][p]) for p in range(2)]
               for q in range(2)]
    dws = []
    for dy in range(3):
        row = []
        for dx in range(3):
            acc = jnp.zeros((cin, cout), F32)
            for pi in range(2):
                q = (pi + dy - 1) % 2
                sy = (pi + dy - 1) // 2
                for pj in range(2):
                    p = (pj + dx - 1) % 2
                    sx = (pj + dx - 1) // 2
                    tap = _tap_shift(in_vars[q][p], sy, sx)
                    acc = acc + jax.lax.dot_general(
                        tap.reshape(r_out * w, cin),
                        dout_phases[pi][pj].reshape(r_out * w, cout),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=F32)
            row.append(acc)
        dws.append(row)
    return jnp.stack([jnp.stack(r) for r in dws])  # [3, 3, Cin, Cout]


def _flipT(w: jnp.ndarray) -> jnp.ndarray:
    """conv3x3 transpose kernel: flip both spatial dims, swap in/out."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


def _with_halo(block_ref, halo_ref, halo: int) -> jnp.ndarray:
    """Reassemble a halo'd strip [strip + 2*halo, W, C] from a main block
    and its `_strip_halos` companion block (leading dims already indexed)."""
    return jnp.concatenate(
        [halo_ref[:halo], block_ref, halo_ref[halo:]], axis=0)


def _recompute_h(x_strip, s_planes, wd_v, bd_v, lo, hc, rows, wc, cd, cskip,
                 dtype):
    """Deconv phase planes (+ masked skip planes), shared fwd/bwd."""
    h = [[None, None], [None, None]]
    s = [[None, None], [None, None]]
    for di in range(2):
        for dj in range(2):
            hp = jax.lax.dot_general(
                x_strip, wd_v[2 * di + dj], (((1,), (0,)), ((), ())),
                preferred_element_type=F32) + bd_v
            hp = hp.reshape(rows, wc, cd).astype(dtype)
            # rows outside the image must act as conv zero-padding, which
            # deconv(0)+bias does not satisfy
            h[di][dj] = _row_mask(hp, lo, hc)
            if cskip:
                s[di][dj] = _row_mask(s_planes[di][dj], lo, hc)
    return h, s


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fused_stage_kernel(xb, xh, sb, sh, wd, bd, w1d, w1s, b1, w2, b2,
                        out_ref, *, strip, hc, wc, cin, cskip, cd, cout,
                        dtype):
    ti = pl.program_id(1)
    lo = ti * strip - 2          # first coarse row of the halo'd strip
    rows = strip + 4

    xs = _with_halo(xb[0], xh[0], 2)            # [rows, wc, cin]
    x_strip = xs.reshape(rows * wc, cin)
    s_planes = [[None, None], [None, None]]
    if cskip:
        for di in range(2):
            for dj in range(2):
                q = 2 * di + dj
                s_planes[di][dj] = _with_halo(sb[q, 0], sh[q, 0], 2)

    h, s = _recompute_h(x_strip, s_planes, wd[...], bd[0], lo, hc, rows, wc,
                        cd, cskip, dtype)

    # --- conv_a -> relu -> conv_b, all in phase space ---
    extra = (s, w1s[...]) if cskip else None
    g = _conv3x3_phase(h, w1d[...], b1[0], dtype, extra=extra)
    for pi in range(2):
        for pj in range(2):
            g[pi][pj] = _row_mask(jnp.maximum(g[pi][pj], 0.0), lo + 1, hc)
    y = _conv3x3_phase(g, w2[...], b2[0], F32)

    for pi in range(2):
        for pj in range(2):
            out_ref[2 * pi + pj, 0] = y[pi][pj].astype(out_ref.dtype)


def _prep_strip_inputs(x, skip, strip, dtype):
    """Main strip arrays (UNPADDED - BlockSpec partitions them into the true
    strips) + halo companions (from the row-padded arrays, so image-boundary
    halos are zeros) for x and the phase-split skip planes.

    No-skip stages carry NO dummy skip arrays: the callers omit the skip
    operands (and the dskip output) from the pallas_call entirely, because a
    [4,B,Hc,Wc,1] f32 companion would be lane-padded 128x in HBM under
    Pallas's forced row-major layouts (ADVICE r3; docs/PERFORMANCE.md
    "Fused LMU")."""
    xh = _strip_halos(pad_rows(x, 2), strip, 2)
    if skip is None:
        return xh, None, None
    sph = _phase_major(skip.astype(dtype))            # [4, B, Hc, Wc, Cs]
    sh = _strip_halos(pad_rows(sph, 2, axis=2), strip, 2, axis=2)
    return xh, sph, sh


def fused_stage(x: jnp.ndarray, skip: Optional[jnp.ndarray],
                wd: jnp.ndarray, bd: jnp.ndarray,
                w1: jnp.ndarray, b1: jnp.ndarray,
                w2: jnp.ndarray, b2: jnp.ndarray,
                strip: int = 16, interpret: bool = False) -> jnp.ndarray:
    """Fused deconv2x2 [+ skip concat] + conv3x3 + relu + conv3x3.

    x: [B, Hc, Wc, Cin]; skip: [B, 2Hc, 2Wc, Cskip] or None;
    wd: [2, 2, Cin, Cd] (Deconv2x2 param layout, nn/decoder.py:49);
    w1: [3, 3, Cd+Cskip, C1]; w2: [3, 3, C1, Cout].
    Returns [B, 2Hc, 2Wc, Cout] float32 (same math as DecoderStage with
    DoubleConv / HeadConv, nn/decoder.py:66-96).
    """
    b, hc, wc, cin = x.shape
    cd = wd.shape[-1]
    cskip = 0 if skip is None else skip.shape[-1]
    c1 = w1.shape[-1]
    cout = w2.shape[-1]
    dtype = x.dtype
    strip = min(strip, hc)
    assert hc % strip == 0, (hc, strip)
    assert w1.shape[2] == cd + cskip, (w1.shape, cd, cskip)
    cs = max(cskip, 1)
    n = hc // strip

    xh, sph, sh = _prep_strip_inputs(x, skip, strip, dtype)

    base = functools.partial(
        _fused_stage_kernel, strip=strip, hc=hc, wc=wc, cin=cin,
        cskip=cskip, cd=cd, cout=cout, dtype=dtype)

    in_specs = [
        pl.BlockSpec((1, strip, wc, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # x strip
        pl.BlockSpec((1, 4, wc, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # x halos
    ]
    operands = [x, xh]
    if cskip:
        kernel = base
        in_specs += [
            pl.BlockSpec((4, 1, strip, wc, cs),
                         lambda bi, ti: (0, bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),              # skip
            pl.BlockSpec((4, 1, 4, wc, cs),
                         lambda bi, ti: (0, bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),              # skip halos
        ]
        operands += [sph, sh]
        w1s = w1[:, :, cd:]
    else:
        # no dummy skip operands (they would be 128x lane-padded in HBM);
        # the kernel body never reads them when cskip == 0
        def kernel(xb, xh_, wd_, bd_, w1d_, w1s_, b1_, w2_, b2_, out_ref):
            base(xb, xh_, None, None, wd_, bd_, w1d_, w1s_, b1_, w2_, b2_,
                 out_ref)
        w1s = jnp.zeros((3, 3, 1, c1), w1.dtype)   # tiny, keeps arity stable
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),     # wd [4, Cin, Cd]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # bd [1, Cd]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w1d [3,3,Cd,C1]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w1s [3,3,Cs,C1]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # b1 [1, C1]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w2 [3,3,C1,Cout]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # b2 [1, Cout]
    ]
    operands += [
        wd.reshape(4, cin, cd).astype(dtype), bd.astype(F32)[None],
        w1[:, :, :cd].astype(dtype), w1s.astype(dtype),
        b1.astype(F32)[None], w2.astype(dtype), b2.astype(F32)[None]]

    out = pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, 1, strip, wc, cout), lambda bi, ti: (0, bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, b, hc, wc, cout), F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),  # default ~16M scoped
        interpret=interpret,
    )(*operands)
    return _phase_major_to_fine(out)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _fused_stage_bwd_kernel(xb, xh, sb, sh, dyb, dyh, wd, w1d, w1s, w2,
                            w1dT, w1sT, w2T, bd, b1,
                            dx_ref, dskip_ref, dwd_ref, dbd_ref, dw1d_ref,
                            dw1s_ref, db1_ref, dw2_ref, db2_ref, *,
                            strip, hc, wc, cin, cskip, cd, c1, cout, dtype):
    """One-HBM-pass backward: recomputes h and g in VMEM (remat inside the
    kernel), then produces dx, dskip and all weight/bias grads. Reads x
    (+skip) and dy once; writes dx (+dskip) once; the fine 2x-resolution
    intermediates and their gradients never touch HBM. Weight/bias grads
    accumulate in VMEM across the sequential TPU grid."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    lo = ti * strip - 2
    rows = strip + 4

    first = jnp.logical_and(bi == 0, ti == 0)

    @pl.when(first)
    def _zero_accs():
        for ref in (dwd_ref, dbd_ref, dw1d_ref, dw1s_ref, db1_ref, dw2_ref,
                    db2_ref):
            ref[...] = jnp.zeros(ref.shape, F32)

    xs = _with_halo(xb[0], xh[0], 2)
    x_strip = xs.reshape(rows * wc, cin)
    s_planes = [[None, None], [None, None]]
    if cskip:
        for di in range(2):
            for dj in range(2):
                q = 2 * di + dj
                s_planes[di][dj] = _with_halo(sb[q, 0], sh[q, 0], 2)
    dy_phases = [[None, None], [None, None]]
    for pi in range(2):
        for pj in range(2):
            q = 2 * pi + pj
            dy_phases[pi][pj] = _with_halo(dyb[q, 0], dyh[q, 0],
                                           2).astype(dtype)

    wd_v, w1d_v, w2_v = wd[...], w1d[...], w2[...]
    w1s_v = w1s[...]

    # --- recompute h (+ masked skip planes) and g exactly as forward ---
    h, s = _recompute_h(x_strip, s_planes, wd_v, bd[0], lo, hc, rows, wc,
                        cd, cskip, dtype)
    extra = (s, w1s_v) if cskip else None
    ga = _conv3x3_phase(h, w1d_v, b1[0], F32, extra=extra)
    g = [[None, None], [None, None]]
    relu_mask = [[None, None], [None, None]]
    for pi in range(2):
        for pj in range(2):
            gm = _row_mask(ga[pi][pj], lo + 1, hc)
            relu_mask[pi][pj] = gm > 0.0
            g[pi][pj] = jnp.where(relu_mask[pi][pj], gm, 0.0).astype(dtype)

    # --- dg = conv3x3(dy, flipT(w2)) on rows strip+2; relu gate ---
    zero_c1 = jnp.zeros((c1,), F32)
    dg = _conv3x3_phase(dy_phases, w2T[...], zero_c1, F32)
    dgr = [[None, None], [None, None]]
    for pi in range(2):
        for pj in range(2):
            dgr[pi][pj] = jnp.where(relu_mask[pi][pj], dg[pi][pj],
                                    0.0).astype(dtype)

    # --- dh = conv3x3(dgr, flipT(w1)) on TRUE rows (strip), split into the
    # deconv rows (-> dx, dwd) and skip rows (-> dskip) ---
    zero_cd = jnp.zeros((cd,), F32)
    dh = _conv3x3_phase(dgr, w1dT[...], zero_cd, F32)
    if cskip:
        zero_cs = jnp.zeros((w1s_v.shape[2],), F32)
        dsk = _conv3x3_phase(dgr, w1sT[...], zero_cs, F32)

    dx_acc = jnp.zeros((strip * wc, cin), F32)
    dwd_c = []
    dbd_c = jnp.zeros((cd,), F32)
    x_true = xs[2:-2].reshape(strip * wc, cin)
    for di in range(2):
        for dj in range(2):
            dhd = dh[di][dj].reshape(strip * wc, cd)
            dx_acc = dx_acc + jax.lax.dot_general(
                dhd.astype(dtype), wd_v[2 * di + dj],
                (((1,), (1,)), ((), ())), preferred_element_type=F32)
            dwd_c.append(jax.lax.dot_general(
                x_true.astype(dtype), dhd.astype(dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=F32))
            dbd_c = dbd_c + jnp.sum(dhd, axis=0)
            if cskip:
                dskip_ref[2 * di + dj, 0] = dsk[di][dj].astype(
                    dskip_ref.dtype)
    dx_ref[0] = dx_acc.reshape(strip, wc, cin).astype(dx_ref.dtype)
    dwd_ref[...] += jnp.stack(dwd_c)
    dbd_ref[...] += dbd_c[None]

    # --- dw1/db1: taps of h (and skip planes) x dgr TRUE rows ---
    h_in = [[h[q][p][1:-1] for p in range(2)] for q in range(2)]
    dgr_true = [[dgr[pi][pj][1:-1] for pj in range(2)] for pi in range(2)]
    dw1d_ref[...] += _conv3x3_wgrad(h_in, dgr_true, (cd, c1))
    if cskip:
        s_in = [[s[q][p][1:-1] for p in range(2)] for q in range(2)]
        dw1s_ref[...] += _conv3x3_wgrad(s_in, dgr_true,
                                        (w1s_v.shape[2], c1))
    db1_ref[...] += sum(jnp.sum(dgr_true[pi][pj].astype(F32), axis=(0, 1))
                        for pi in range(2) for pj in range(2))[None]

    # --- dw2/db2: taps of g (halo 1) x dy TRUE rows ---
    dy_true = [[dy_phases[pi][pj][2:-2] for pj in range(2)]
               for pi in range(2)]
    dw2_ref[...] += _conv3x3_wgrad(g, dy_true, (c1, cout))
    db2_ref[...] += sum(jnp.sum(dy_true[pi][pj].astype(F32), axis=(0, 1))
                        for pi in range(2) for pj in range(2))[None]


def fused_stage_bwd_pallas(x, skip, dy, wd, bd, w1, b1, w2, b2,
                           strip=16, interpret=False):
    """Pallas backward for `fused_stage`. Returns
    (dx, dskip, dwd, dbd, dw1, db1, dw2, db2); dskip is None without skip.

    dy: [B, 2Hc, 2Wc, Cout] fine-layout cotangent (f32).
    bd/b1 enter only through the h/g recompute (values, not grads)."""
    b, hc, wc, cin = x.shape
    cd = wd.shape[-1]
    cskip = 0 if skip is None else skip.shape[-1]
    c1 = w1.shape[-1]
    cout = w2.shape[-1]
    dtype = x.dtype
    strip = min(strip, hc)
    assert hc % strip == 0, (hc, strip)
    cs = max(cskip, 1)
    n = hc // strip

    xh, sph, sh = _prep_strip_inputs(x, skip, strip, dtype)
    dyph = _phase_major(dy.astype(F32))              # [4, B, Hc, Wc, Cout]
    dyh = _strip_halos(pad_rows(dyph, 2, axis=2), strip, 2, axis=2)

    base = functools.partial(
        _fused_stage_bwd_kernel, strip=strip, hc=hc, wc=wc, cin=cin,
        cskip=cskip, cd=cd, cout=cout, c1=c1, dtype=dtype)

    const3 = lambda bi, ti: (0, 0, 0)     # noqa: E731 - accumulators stay
    const4 = lambda bi, ti: (0, 0, 0, 0)  # noqa: E731   resident in VMEM
    const2 = lambda bi, ti: (0, 0)        # noqa: E731

    in_specs = [
        pl.BlockSpec((1, strip, wc, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # x strip
        pl.BlockSpec((1, 4, wc, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # x halos
    ]
    operands = [x, xh]
    if cskip:
        kernel = base
        in_specs += [
            pl.BlockSpec((4, 1, strip, wc, cs),
                         lambda bi, ti: (0, bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),              # skip
            pl.BlockSpec((4, 1, 4, wc, cs),
                         lambda bi, ti: (0, bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),              # skip halo
        ]
        operands += [sph, sh]
        w1s = w1[:, :, cd:]
    else:
        # no dummy skip operands and NO dskip output: a [4,B,Hc,Wc,1]
        # companion would be 128x lane-padded in HBM (ADVICE r3)
        def kernel(xb, xh_, dyb, dyh_, wd_, w1d_, w1s_, w2_, w1dT_, w1sT_,
                   w2T_, bd_, b1_, dx_ref, dwd_ref, dbd_ref, dw1d_ref,
                   dw1s_ref, db1_ref, dw2_ref, db2_ref):
            base(xb, xh_, None, None, dyb, dyh_, wd_, w1d_, w1s_, w2_,
                 w1dT_, w1sT_, w2T_, bd_, b1_, dx_ref, None, dwd_ref,
                 dbd_ref, dw1d_ref, dw1s_ref, db1_ref, dw2_ref, db2_ref)
        w1s = jnp.zeros((3, 3, 1, c1), w1.dtype)   # tiny, keeps arity stable
    in_specs += [
        pl.BlockSpec((4, 1, strip, wc, cout),
                     lambda bi, ti: (0, bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # dy
        pl.BlockSpec((4, 1, 4, wc, cout),
                     lambda bi, ti: (0, bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # dy halos
        pl.BlockSpec(memory_space=pltpu.VMEM),     # wd
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w1d
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w1s
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w2
        pl.BlockSpec(memory_space=pltpu.VMEM),     # w1dT (pre-flipped:
        pl.BlockSpec(memory_space=pltpu.VMEM),     #  w1sT  Mosaic has no
        pl.BlockSpec(memory_space=pltpu.VMEM),     #  w2T   in-kernel rev)
        pl.BlockSpec(memory_space=pltpu.VMEM),     # bd [1, Cd]
        pl.BlockSpec(memory_space=pltpu.VMEM),     # b1 [1, C1]
    ]
    operands += [
        dyph, dyh,
        wd.reshape(4, cin, cd).astype(dtype),
        w1[:, :, :cd].astype(dtype), w1s.astype(dtype),
        w2.astype(dtype),
        _flipT(w1[:, :, :cd]).astype(dtype), _flipT(w1s).astype(dtype),
        _flipT(w2).astype(dtype),
        bd.astype(F32)[None], b1.astype(F32)[None]]

    out_specs = [
        pl.BlockSpec((1, strip, wc, cin), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),                  # dx
    ]
    out_shape = [jax.ShapeDtypeStruct((b, hc, wc, cin), dtype)]
    if cskip:
        out_specs += [pl.BlockSpec((4, 1, strip, wc, cs),
                                   lambda bi, ti: (0, bi, ti, 0, 0),
                                   memory_space=pltpu.VMEM)]     # dskip
        out_shape += [jax.ShapeDtypeStruct((4, b, hc, wc, cs), dtype)]
    out_specs += [
        pl.BlockSpec((4, cin, cd), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cd), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cd, c1), const4, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cs, c1), const4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c1), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c1, cout), const4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const2, memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((4, cin, cd), F32),
        jax.ShapeDtypeStruct((1, cd), F32),
        jax.ShapeDtypeStruct((3, 3, cd, c1), F32),
        jax.ShapeDtypeStruct((3, 3, cs, c1), F32),
        jax.ShapeDtypeStruct((1, c1), F32),
        jax.ShapeDtypeStruct((3, 3, c1, cout), F32),
        jax.ShapeDtypeStruct((1, cout), F32),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),  # default ~16M scoped
        interpret=interpret,
    )(*operands)
    if cskip:
        (dx, dskip_ph, dwd, dbd, dw1d, dw1s, db1, dw2, db2) = out
    else:
        (dx, dwd, dbd, dw1d, dw1s, db1, dw2, db2) = out
        dskip_ph = None
    dwd = dwd.reshape(2, 2, cin, cd)
    if cskip:
        dskip = _phase_major_to_fine(dskip_ph).astype(skip.dtype)
        dw1 = jnp.concatenate([dw1d, dw1s], axis=2)
    else:
        dskip = None
        dw1 = dw1d
    return (dx, dskip, dwd.astype(wd.dtype), dbd[0].astype(bd.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


# ---------------------------------------------------------------------------
# differentiable wrapper + XLA reference implementations
# ---------------------------------------------------------------------------

def _xla_chain(x, skip, wd, bd, w1, b1, w2, b2):
    """The stage as plain XLA ops at the SAME precision policy as the kernel
    (activations in x.dtype, f32 accumulation, f32 output) - used as the
    backward-pass recompute graph for `fused_stage_diff` (bwd_impl='xla')."""
    # The same precision policy as the kernel: values are rounded to x.dtype
    # between stages, accumulation is f32. Convs run with BOTH operands f32
    # (not bf16 + preferred_element_type=F32: that mix is not differentiable
    # - the f32 cotangent meets the bf16 operand inside the VJP's conv and
    # lax.conv_general_dilated rejects mixed dtypes).
    dt = x.dtype
    y = jax.lax.conv_transpose(
        x.astype(F32), wd[::-1, ::-1].astype(F32), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
    y = y.astype(dt)
    if skip is not None:
        y = jnp.concatenate([y, skip.astype(dt)], axis=-1)
    y = jax.lax.conv_general_dilated(
        y.astype(F32), w1.astype(F32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jnp.maximum(y, 0.0).astype(dt)
    y = jax.lax.conv_general_dilated(
        y.astype(F32), w2.astype(F32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_stage_diff(x, skip, wd, bd, w1, b1, w2, b2,
                     strip=16, interpret=False, bwd_impl="pallas"):
    """Differentiable fused stage - Pallas kernel forward, remat-style
    backward (only the INPUTS are saved between forward and backward; the
    2x-resolution deconv/conv_a intermediates never persist in HBM).

    bwd_impl='pallas': one-HBM-pass backward kernel
    (`fused_stage_bwd_pallas`) - recomputes h/g strip-by-strip in VMEM and
    emits dx/dskip plus all weight grads (accumulated across the grid).
    bwd_impl='xla': differentiate the plain `_xla_chain` recompute (the
    conv_b primal is dead code and DCE'd); used for cross-checking.
    """
    return fused_stage(x, skip, wd, bd, w1, b1, w2, b2,
                       strip=strip, interpret=interpret)


def _fused_stage_fwd(x, skip, wd, bd, w1, b1, w2, b2, strip, interpret,
                     bwd_impl):
    out = fused_stage(x, skip, wd, bd, w1, b1, w2, b2,
                      strip=strip, interpret=interpret)
    return out, (x, skip, wd, bd, w1, b1, w2, b2)


def _fused_stage_bwd(strip, interpret, bwd_impl, res, g):
    x, skip, wd, bd, w1, b1, w2, b2 = res
    if bwd_impl == "pallas":
        return fused_stage_bwd_pallas(x, skip, g, wd, bd, w1, b1, w2, b2,
                                      strip=strip, interpret=interpret)
    if skip is None:
        def f(x, wd, bd, w1, b1, w2, b2):
            return _xla_chain(x, None, wd, bd, w1, b1, w2, b2)
        _, vjp = jax.vjp(f, x, wd, bd, w1, b1, w2, b2)
        dx, dwd, dbd, dw1, db1, dw2, db2 = vjp(g)
        dskip = None
    else:
        _, vjp = jax.vjp(_xla_chain, x, skip, wd, bd, w1, b1, w2, b2)
        dx, dskip, dwd, dbd, dw1, db1, dw2, db2 = vjp(g)
    return dx, dskip, dwd, dbd, dw1, db1, dw2, db2


fused_stage_diff.defvjp(_fused_stage_fwd, _fused_stage_bwd)


def fused_stage_reference(x, skip, wd, bd, w1, b1, w2, b2):
    """jnp reference implementation (same math as nn/decoder.py modules)."""
    b, hc, wc, cin = x.shape
    y = jnp.einsum("bhwc,ijco->bhiwjo", x.astype(F32), wd.astype(F32))
    y = y.reshape(b, 2 * hc, 2 * wc, wd.shape[-1]) + bd
    if skip is not None:
        y = jnp.concatenate([y, skip.astype(F32)], axis=-1)
    y = jax.lax.conv_general_dilated(
        y, w1.astype(F32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jnp.maximum(y, 0.0)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(F32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    return y
