"""TF-style 'SAME' padding arithmetic with the reference's static-224 quirk,
plus horizontal-circular padding for 360-degree panoramas.

The reference builds EfficientNet with `Conv2dStaticSamePadding` whose pad
amounts are computed at CONSTRUCTION time from the nominal ImageNet size 224
(reference efficientnet_pytorch/utils.py:254-282, :602-624, model.py:176), not
from the actual input. Because SAME padding for stride-1 convs is
size-independent (pad = k-1) and for the stride-2 convs the traced sizes
224/112/56/28/14 all yield the same amounts, every pad in B0 is a fixed
constant. We reproduce the arithmetic exactly so that e.g. an Oxford 154x231
ground image produces a 4x7 feature map (SURVEY.md 2.3.3) - then bake the
results in as static pads, which is also exactly what XLA wants.

Circular variant (utils.py:285-358): wrap-pad the width axis, zero-pad height.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# (kernel, stride) of every spatial conv in EfficientNet-B0, in order:
# stem k3 s2, then per-block depthwise convs
# r1_k3_s1 | r2_k3_s2 | r2_k5_s2 | r3_k3_s2 | r3_k5_s1 | r4_k5_s2 | r1_k3_s1
# (utils.py:647-655).
B0_STEM = (3, 2)
B0_BLOCKS: Tuple[Tuple[int, int], ...] = (
    (3, 1),
    (3, 2), (3, 1),
    (5, 2), (5, 1),
    (3, 2), (3, 1), (3, 1),
    (5, 1), (5, 1), (5, 1),
    (5, 2), (5, 1), (5, 1), (5, 1),
    (3, 1),
)


def same_pad_1d(size: int, kernel: int, stride: int, dilation: int = 1) -> Tuple[int, int]:
    """TF SAME pad (lo, hi) for one spatial dim, identical arithmetic to
    Conv2dStaticSamePadding.__init__ (utils.py:266-275)."""
    out = math.ceil(size / stride)
    pad = max((out - 1) * stride + (kernel - 1) * dilation + 1 - size, 0)
    return pad // 2, pad - pad // 2


def traced_same_pads(
    image_size: Tuple[int, int] = (224, 224),
    layers: Sequence[Tuple[int, int]] = (B0_STEM,) + B0_BLOCKS,
) -> Tuple[Tuple[Tuple[int, int], Tuple[int, int]], ...]:
    """Per-layer ((pad_top, pad_bottom), (pad_left, pad_right)), tracing the
    nominal image size through the strides exactly as the reference does at
    construction (model.py:176-198, utils.py:174-191)."""
    h, w = image_size
    pads = []
    for k, s in layers:
        pads.append((same_pad_1d(h, k, s), same_pad_1d(w, k, s)))
        h, w = math.ceil(h / s), math.ceil(w / s)
    return tuple(pads)


def b0_output_size(input_size: Tuple[int, int]) -> Tuple[int, int]:
    """Actual backbone output H, W for a real input under the static-224 pads.

    conv output = floor((size + pad - kernel) / stride) + 1 per dim.
    """
    pads = traced_same_pads()
    h, w = input_size
    for ((pt, pb), (pl, pr)), (k, s) in zip(pads, (B0_STEM,) + B0_BLOCKS):
        h = (h + pt + pb - k) // s + 1
        w = (w + pl + pr - k) // s + 1
    return h, w


def pad_same(
    x: jnp.ndarray,
    pad_h: Tuple[int, int],
    pad_w: Tuple[int, int],
    circular: bool = False,
) -> jnp.ndarray:
    """Apply static padding to an NHWC tensor.

    circular=True wraps the width axis and zero-pads height, matching
    Conv2dStaticCircularPadding (utils.py:330-358).
    """
    if pad_h == (0, 0) and pad_w == (0, 0):
        return x
    if circular:
        if pad_w != (0, 0):
            x = jnp.pad(x, ((0, 0), (0, 0), pad_w, (0, 0)), mode="wrap")
        if pad_h != (0, 0):
            x = jnp.pad(x, ((0, 0), pad_h, (0, 0), (0, 0)))
        return x
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)))


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
          pad_h: Tuple[int, int], pad_w: Tuple[int, int],
          groups: int) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def conv_circular_same(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    pad_h: Tuple[int, int],
    pad_w: Tuple[int, int],
    groups: int = 1,
) -> jnp.ndarray:
    """Conv with horizontal-CIRCULAR padding, without materializing the wrap.

    Value-equal to `conv(pad_same(x, (0,0), pad_w, circular=True))` with the
    H pad riding the conv (the behavior of Conv2dStaticCircularPadding,
    reference efficientnet_pytorch/utils.py:330-358), but built so XLA never
    writes a wrapped copy of the whole tensor: the conv runs with ZERO W
    padding (free — padding is part of the conv op), and only the <=2 output
    columns per side whose receptive field crosses the wrap are recomputed
    from tiny wrapped strips and spliced in with static dynamic-update-slices.
    The edge convs evaluate the identical windows the wrapped conv would, so
    the result is bitwise-equal in every column; the r4 trace attributed
    ~23 ms/step of the grd encoder to these wrap copies (docs/PERFORMANCE.md).
    """
    pl, pr = pad_w
    k = kernel.shape[1]
    w_in = x.shape[2]
    y = _conv(x, kernel, stride, pad_h, pad_w, groups)
    if pl == 0 and pr == 0:
        return y
    w_out = y.shape[2]
    # Output column j reads padded columns [j*s, j*s+k); padded p maps to
    # input p-pl, wrapping negatives to W+p-pl and overflow to p-pl-W.
    n_left = -(-pl // stride) if pl else 0
    j0_right = (pl + w_in - k) // stride + 1
    n_right = max(0, w_out - j0_right)
    if n_left:
        span = (n_left - 1) * stride + k
        strip = jnp.concatenate(
            [x[:, :, w_in - pl:, :], x[:, :, : span - pl, :]], axis=2)
        fix = _conv(strip, kernel, stride, pad_h, (0, 0), groups)
        y = jax.lax.dynamic_update_slice_in_dim(y, fix, 0, axis=2)
    if n_right:
        span = (n_right - 1) * stride + k
        start = j0_right * stride - pl
        wrap = span - (w_in - start)
        parts = [x[:, :, start:, :]]
        if wrap > 0:
            parts.append(x[:, :, :wrap, :])
        strip = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        fix = _conv(strip, kernel, stride, pad_h, (0, 0), groups)
        y = jax.lax.dynamic_update_slice_in_dim(y, fix, w_out - n_right,
                                                axis=2)
    return y
