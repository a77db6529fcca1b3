"""Phase-space (space-to-depth) fine decoder stages, in pure XLA.

The fine stages of both decoders (reference models.py:204-341: deconv2x2 ->
skip concat -> conv3x3 -> ReLU -> conv3x3, and the final deconv -> head
chain models.py:125-127) run convolutions on [B, 512, 512, 16] /
[B, 256, 256, 40] tensors whose few channels waste the TPU's 128-wide
vector lane: XLA's conv emitter was measured at 77-90 GB/s effective of the
v5e's 819 GB/s HBM peak on exactly these shapes (tools/bench_layout.py,
docs/PERFORMANCE.md). This module keeps every fine map in its 2x2
space-to-depth packing [B, H/2, W/2, 4C] (lane dim 4C = 64..224) instead:

  * deconv2x2 (kernel 2, stride 2) has zero tap overlap, so packed it is
    ONE matmul  x @ W[Cin, 4*Cd]  — the fine-resolution map is never
    materialized in HBM;
  * a fine 3x3 pad-1 conv becomes, per output phase p = (pi, pj), a 2x2
    coarse conv over all 4 input phases: fine row 2I+pi+dy falls in coarse
    row I+si of input phase qi with si = (pi+dy)>>1, qi = (pi+dy)&1, so
    each of the 9 fine taps occupies one (row, col, phase) slot of a
    [2, 2, 4Cin, Cout] kernel (9 of 16 tap-phase slots nonzero -> 16/9 the
    fine conv's FLOPs, in exchange for MXU-shaped operands with reduction
    dim 16*Cin and a lane-filling activation layout);
  * only the stage result is unpacked to fine NHWC (`depth_to_space`, one
    transpose pass) — or handed packed to a packed consumer (final head).

Numerics: identical tap set and weights as the fine-layout ops — the
parameter tree is untouched; packed kernels are built from the stored
[3,3,Cin,Cout] / [2,2,Cin,Cd] weights at trace time (tiny scatters,
constant-folded). Verified against the fine-layout path in
tests/test_phase_space.py.

Round-3 history: the same phase decomposition was first built as a fused
Mosaic kernel (ops/lmu_pallas.py) and measured to LOSE 0.12-0.35x to XLA
because Pallas forces row-major lane-padded layouts on its HBM operands;
this module is the round-4 reformulation the r3 verdict asked for — same
math, emitted as XLA ops so the compiler keeps layout freedom.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

F32 = jnp.float32


def depth_to_space(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """[B, H, W, 2*2*Cout] phase layout -> [B, 2H, 2W, Cout] NHWC.
    Channel index is (di*2 + dj)*Cout + c."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def space_to_depth(y: jnp.ndarray) -> jnp.ndarray:
    """[B, 2H, 2W, C] NHWC -> [B, H, W, 2*2*C] phase layout (inverse of
    `depth_to_space`: channel index = (di*2 + dj)*C + c)."""
    b, h2, w2_, c = y.shape
    y = y.reshape(b, h2 // 2, 2, w2_ // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h2 // 2, w2_ // 2, 4 * c)


def deconv2x2_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2) emitting the packed fine map.

    x [B, H, W, Cin], kernel [2, 2, Cin, Cd] (the stored Deconv2x2 layout,
    nn/decoder.py:28) -> [B, H, W, 4*Cd] with channel (di*2+dj)*Cd + o =
    fine[2I+di, 2J+dj, o]. One MXU matmul; numerically the same
    contraction as the fine-layout einsum path.
    """
    cin, cd = kernel.shape[2], kernel.shape[3]
    w = kernel.transpose(2, 0, 1, 3).reshape(cin, 4 * cd)
    y = jnp.einsum("bhwc,cd->bhwd", x, w.astype(x.dtype),
                   preferred_element_type=F32)
    return y + jnp.tile(bias, 4)


def _phase_conv_kernel(w: jnp.ndarray, pi: int, pj: int, cd: int,
                       cs: int) -> jnp.ndarray:
    """[2, 2, 4*cd + 4*cs, Cout] packed kernel for output phase (pi, pj).

    w: [3, 3, cd + cs, Cout] fine 3x3 weights whose input channels are
    [deconv block | skip block]. Packed activation layout is
    [4*cd q-major | 4*cs q-major] (deconv output next to space_to_depth
    of the skip, concatenated — no interleave pass over the activations;
    the interleave happens here, on the weights).

    Tap (dy, dx) of output phase (pi, pj) reads input phase
    q = 2*((pi+dy)&1) + ((pj+dx)&1) at coarse offset (si, sj) =
    ((pi+dy)>>1, (pj+dx)>>1); with asymmetric padding
    ((1-pi, pi), (1-pj, pj)) the kernel slot is (si+1-pi, sj+1-pj).
    """
    cout = w.shape[3]
    kp = jnp.zeros((2, 2, 4 * (cd + cs), cout), w.dtype)
    for dy in (-1, 0, 1):
        qi, si = (pi + dy) & 1, (pi + dy) >> 1
        a = si + 1 - pi
        for dx in (-1, 0, 1):
            qj, sj = (pj + dx) & 1, (pj + dx) >> 1
            b = sj + 1 - pj
            q = 2 * qi + qj
            tap = w[1 + dy, 1 + dx]          # [cd + cs, Cout]
            kp = kp.at[a, b, q * cd:(q + 1) * cd, :].set(tap[:cd])
            if cs:
                kp = kp.at[a, b,
                           4 * cd + q * cs:4 * cd + (q + 1) * cs, :].set(
                               tap[cd:])
    return kp


def conv3x3_packed(z: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                   cd: Optional[int] = None, cs: int = 0,
                   impl: str = "onebig") -> jnp.ndarray:
    """Fine 3x3 pad-1 conv evaluated on a packed map.

    z: [B, H, W, 4*cd + 4*cs] packed (see `_phase_conv_kernel` for the
    channel layout; cs = 0 for a uniformly packed input).
    w: [3, 3, cd + cs, Cout], bias: [Cout] — the stored fine-conv params.
    Returns [B, H, W, 4*Cout] packed.

    impl:
      'onebig': ONE [2, 2, 4Cin, 4Cout] VALID conv on the 1-padded input
        (all 4 output phases as output-channel blocks, each phase's window
        offset recovered by a shifted slice), then one slice+concat pass.
      'phase4': four [2, 2, 4Cin, Cout] convs with per-phase asymmetric
        padding, concatenated.
    Both run the identical 9-tap contraction per output value.
    """
    if cd is None:
        cd = w.shape[2]
    cout = w.shape[3]
    h, wd_ = z.shape[1], z.shape[2]
    dn = ("NHWC", "HWIO", "NHWC")
    # NOTE: convs run in z.dtype (like flax nn.Conv(dtype=...)): the conv VJP
    # rejects mixed-dtype operands, so preferred_element_type=f32 over bf16
    # inputs breaks the backward. MXU accumulation is f32 internally either
    # way; only the stored output rounds to z.dtype.
    if impl == "phase4":
        outs = []
        for pi in (0, 1):
            for pj in (0, 1):
                kp = _phase_conv_kernel(w, pi, pj, cd, cs)
                outs.append(jax.lax.conv_general_dilated(
                    z, kp.astype(z.dtype), (1, 1),
                    ((1 - pi, pi), (1 - pj, pj)),
                    dimension_numbers=dn))
        y = jnp.concatenate(outs, axis=-1)
    elif impl == "onebig":
        k = jnp.concatenate([_phase_conv_kernel(w, pi, pj, cd, cs)
                             for pi in (0, 1) for pj in (0, 1)], axis=-1)
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        full = jax.lax.conv_general_dilated(
            zp, k.astype(z.dtype), (1, 1), "VALID",
            dimension_numbers=dn)
        # full: [B, H+1, W+1, 4*Cout]; phase (pi, pj) lives at spatial
        # offset (pi, pj) of its channel block.
        y = jnp.concatenate([
            full[:, pi:pi + h, pj:pj + wd_,
                 (2 * pi + pj) * cout:(2 * pi + pj + 1) * cout]
            for pi in (0, 1) for pj in (0, 1)], axis=-1)
    else:
        raise ValueError(impl)
    return y + jnp.tile(bias, 4)


def phase_stage(x: jnp.ndarray, skip: Optional[jnp.ndarray],
                deconv_kernel: jnp.ndarray, deconv_bias: jnp.ndarray,
                wa: Optional[jnp.ndarray], ba: Optional[jnp.ndarray],
                wb: Optional[jnp.ndarray], bb: Optional[jnp.ndarray],
                dtype=jnp.bfloat16, impl: str = "onebig",
                unpack: bool = True) -> jnp.ndarray:
    """One full LMU stage in phase space: deconv2x2 -> [skip concat] ->
    conv3x3 -> ReLU -> conv3x3 (reference models.py:108-127).

    wa/ba/wb/bb may be None (deconv-only stage: the final stage whose head
    runs outside, models.py:125-127 — pass unpack=False and feed the packed
    result to `conv3x3_packed` head calls).
    Returns fine NHWC [B, 2H, 2W, C] if unpack else packed [B, H, W, 4C].
    """
    d = deconv2x2_packed(x.astype(dtype), deconv_kernel, deconv_bias)
    d = d.astype(dtype)
    cd = deconv_kernel.shape[3]
    cs = 0
    if skip is not None:
        s = space_to_depth(skip.astype(dtype))
        cs = skip.shape[-1]
        d = jnp.concatenate([d, s], axis=-1)
    if wa is not None:
        g = conv3x3_packed(d, wa, ba, cd, cs, impl).astype(dtype)
        g = jax.nn.relu(g)
        d = conv3x3_packed(g, wb, bb, impl=impl).astype(dtype)
        cd = wb.shape[3]
        cs = 0
    elif cs:
        raise ValueError("deconv-only stage cannot carry a skip")
    return depth_to_space(d, cd) if unpack else d
