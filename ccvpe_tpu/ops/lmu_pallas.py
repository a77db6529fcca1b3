"""Fused LMU decoder stage as a Pallas TPU kernel.

One reference LMU stage (models.py:108-127 defs, :204-341 fwd) is
    y = conv_b( relu( conv_a( concat([deconv2x2(x), skip]) ) ) )
with conv_a/conv_b 3x3 pad-1 (double_conv, models.py:42-47; the final
stage + head conv, models.py:125-127, has the same shape with skip=None).

Why a kernel: at the fine decoder scales (C = 16..56 at 256^2/512^2) XLA's
conv emitter re-reads the input once per kernel tap with batch-padded lane
layouts - measured ~77-90 GB/s effective at batch 64 (tools/bench_layout.py),
i.e. ~10x the logical bytes moved per conv. This kernel reads x (and skip)
ONCE per strip into VMEM, keeps the deconv output and the conv_a
intermediate entirely on-chip, and writes only the final y - the
2x-resolution intermediates never touch HBM.

Layout strategy ("phase space"): the 2x2-stride-2 deconv has zero overlap,
so the fine map decomposes into 4 coarse-resolution phase planes
h[di][dj] = x @ wd[di, dj] - pure MXU matmuls, no interleaving. The 3x3
convs are evaluated per OUTPUT phase as 9 tap-matmuls against coarse-shifted
phase planes (fine shift dy maps to phase (pi+dy-1) mod 2 and coarse row
shift (pi+dy-1)//2 in {-1, 0, 1}); shifts are static slices of the strip.
The kernel's output stays in phase layout [B, Hc, Wc, 4*Cout];
`depth_to_space` (one XLA reshape/transpose on the final small tensor)
restores NHWC.

Boundary semantics: conv pad-1 zero-pads the FINE maps. A fine halo row
outside the image must act as exactly zero - NOT as deconv(0)+bias - so the
kernel masks h (deconv output) and g (conv_a output) rows that fall outside
the image. x/skip are pre-padded by 2 coarse / 4 fine zero rows in XLA so
every strip's DMA is one static slice.

Grid = (B, Hc // strip): one batch item x one strip of coarse rows per
step, with a 2-coarse-row halo (the receptive field of two stacked 3x3
convs at fine scale).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def depth_to_space(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """[B, H, W, 2*2*Cout] phase layout -> [B, 2H, 2W, Cout] NHWC.
    Channel index is (di*2 + dj)*Cout + c."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def _row_mask(vals: jnp.ndarray, lo, hc: int) -> jnp.ndarray:
    """Zero rows of a [R, W, C] strip whose global coarse row lo+r is
    outside [0, hc). jnp.where (not multiply) so stale scratch NaNs can't
    leak through 0*NaN."""
    r = vals.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0) + lo
    ok = jnp.logical_and(rows >= 0, rows < hc)
    return jnp.where(ok, vals, jnp.zeros_like(vals))


def _tap_shift(plane: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """result[r, c] = plane[r + 1 + sy, c + sx] for a [R, W, C] strip with a
    1-row halo top+bottom (returns R-2 rows); sx in {-1, 0, 1} zero-fills at
    the lane edges (true image column edges)."""
    r, w, c = plane.shape
    out = plane[1 + sy:r - 1 + sy]
    if sx == 0:
        return out
    pad = jnp.zeros((out.shape[0], 1, c), plane.dtype)
    if sx == 1:
        return jnp.concatenate([out[:, 1:], pad], axis=1)
    return jnp.concatenate([pad, out[:, :-1]], axis=1)


def _conv3x3_phase(phases, w_taps, bias, out_dtype):
    """3x3 pad-1 conv evaluated in phase space.

    phases[q][p]: [R, W, Cin] coarse strips WITH a 1-coarse-row halo
    top+bottom. w_taps: [3, 3, Cin, Cout]. Returns 2x2 phase planes
    [R-2, W, Cout] (halo consumed)."""
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
                    tap = _tap_shift(phases[q][p], sy, sx)
                    cin = tap.shape[-1]
                    t = jax.lax.dot_general(
                        tap.reshape(r_out * w, cin), w_taps[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=F32)
                    acc = t if acc is None else acc + t
            acc = acc + bias.astype(F32)
            outs[pi][pj] = acc.reshape(r_out, w, -1).astype(out_dtype)
    return outs


def _fused_stage_kernel(x_hbm, skip_hbm, wd, bd, w1, b1, w2, b2, out_ref,
                        xs, ss, sem, ssem, *, strip, hc, wc, cin, cskip, cd,
                        cout, dtype):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    lo = ti * strip - 2          # first coarse row of the halo'd strip
    rows = strip + 4

    # x_hbm is pre-padded by 2 zero rows top+bottom -> padded row = lo + 2
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * strip, rows)], xs, sem)
    cp.start()
    if cskip:
        # skip is fine-resolution, pre-padded by 4 zero rows: fine rows
        # [2*lo, 2*lo + 2*rows) -> padded fine row = 2*lo + 4
        cps = pltpu.make_async_copy(
            skip_hbm.at[bi, pl.ds(2 * ti * strip, 2 * rows)], ss, ssem)
        cps.start()
        cps.wait()
    cp.wait()

    x_strip = xs[:].reshape(rows * wc, cin)
    wd_v, bd_v = wd[...], bd[...]
    w1_v, b1_v = w1[...], b1[...]
    w2_v, b2_v = w2[...], b2[...]

    # --- deconv as 4 phase matmuls (+ optional skip concat) ---
    h = [[None, None], [None, None]]
    for di in range(2):
        for dj in range(2):
            hp = jax.lax.dot_general(
                x_strip, wd_v[2 * di + dj], (((1,), (0,)), ((), ())),
                preferred_element_type=F32) + bd_v
            hp = hp.reshape(rows, wc, cd).astype(dtype)
            if cskip:
                # fine row 2r+di of the strip; fine col 2c+dj
                sk = ss[:].reshape(rows, 2, 2 * wc, cskip)[:, di]
                sk = sk.reshape(rows, wc, 2, cskip)[:, :, dj]
                hp = jnp.concatenate([hp, sk], axis=-1)
            # rows outside the image must act as conv zero-padding, which
            # deconv(0)+bias does not satisfy
            h[di][dj] = _row_mask(hp, lo, hc)

    # --- conv_a -> relu -> conv_b, all in phase space ---
    g = _conv3x3_phase(h, w1_v, b1_v, dtype)
    for pi in range(2):
        for pj in range(2):
            g[pi][pj] = _row_mask(jnp.maximum(g[pi][pj], 0.0), lo + 1, hc)
    y = _conv3x3_phase(g, w2_v, b2_v, F32)

    out = jnp.concatenate(
        [jnp.concatenate([y[0][0], y[0][1]], axis=-1),
         jnp.concatenate([y[1][0], y[1][1]], axis=-1)], axis=-1)
    out_ref[0] = out.astype(out_ref.dtype)


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

    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    if skip is None:
        sp = jnp.zeros((b, 1, 2 * wc, 1), dtype)
    else:
        sp = jnp.pad(skip.astype(dtype), ((0, 0), (4, 4), (0, 0), (0, 0)))

    kernel = functools.partial(
        _fused_stage_kernel, strip=strip, hc=hc, wc=wc, cin=cin,
        cskip=cskip, cd=cd, cout=cout, dtype=dtype)

    rows = strip + 4
    out = pl.pallas_call(
        kernel,
        grid=(b, hc // strip),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),      # skip (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wd [4, Cin, Cd]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # bd
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # b2
        ],
        out_specs=pl.BlockSpec(
            (1, strip, wc, 4 * cout),
            lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, 4 * cout), F32),
        scratch_shapes=[
            pltpu.VMEM((rows, wc, cin), dtype),                    # xs
            pltpu.VMEM((2 * rows, 2 * wc, max(cskip, 1)), dtype),  # ss
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, sp, wd.reshape(4, cin, cd).astype(dtype), bd.astype(F32),
      w1.astype(dtype), b1.astype(F32), w2.astype(dtype), b2.astype(F32))
    return depth_to_space(out, cout)


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
