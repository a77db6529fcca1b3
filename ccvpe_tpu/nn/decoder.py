"""Localization / orientation decoders (LMU: Localization Matching Upsample).

Reference semantics (models.py:108-148 definitions, :204-341 forward):
  loc stage s (coarse->fine):
    x   = concat([max_k matching_score, l2norm(x_prev)])
    x   = ConvTranspose2d(k=2, s=2)(x)
    x   = concat([x, sat skip features])      # stages 1..5
    x   = double_conv(x) = Conv3x3 -> ReLU -> Conv3x3
  final stage: deconv -> head conv (Conv3x3 -> ReLU -> Conv3x3 -> 1 logit).
  ori decoder: bottleneck gets the FULL K-channel matching stack, then the
  same deconv/skip/conv ladder without further matching (models.py:322-341).

TPU-first notes:
  * ConvTranspose2d(k=2, s=2) has zero overlap, so it is implemented as one
    einsum + reshape (pixel -> 2x2 block), i.e. a pure MXU matmul.
  * NHWC; concat on the lane axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class Deconv2x2(nn.Module):
    """ConvTranspose2d(in, out, kernel=2, stride=2):

    out[b, 2i+di, 2j+dj, o] = sum_c x[b,i,j,c] * w[di,dj,c,o] + bias[o]

    Two numerically identical implementations (tests/test_decoder_impl.py):
      'einsum': one MXU matmul + pixel->2x2-block reshape. The reshape
        costs a 6-D layout copy on TPU (visible in device traces).
      'conv': native transposed conv via lax.conv_transpose with the kernel
        spatially flipped (conv_transpose cross-correlates against the
        flipped window; flipping restores the direct-index semantics above).
    Parameter layout is identical for both, so checkpoints interchange.
    """

    features: int
    dtype: Any = jnp.float32
    impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.impl == "conv":
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), kernel[::-1, ::-1].astype(self.dtype),
                (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=False)
        else:
            y = jnp.einsum("bhwc,ijco->bhiwjo", x.astype(self.dtype),
                           kernel.astype(self.dtype),
                           preferred_element_type=jnp.float32)
            y = y.reshape(b, 2 * h, 2 * w, self.features)
        return y + bias


class DoubleConv(nn.Module):
    """Conv3x3(pad 1) -> ReLU -> Conv3x3(pad 1) (models.py:42-47)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_a")(x)
        x = nn.relu(x)
        return nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_b")(x)


class HeadConv(nn.Module):
    """Final head: Conv3x3 -> ReLU -> Conv3x3 to out channels
    (models.py:125-127 loc, :146-148 ori).

    packed=True consumes a phase-packed [B, H, W, 4*cin] map (the final
    DecoderStage's phase-space deconv output), runs both convs packed
    (ops/phase_space.py), and unpacks only the tiny output — the 2x-res
    16-channel intermediate never hits HBM in fine layout. Same params.
    """

    hidden: int
    out: int
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_a = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                         name="conv_a")
        conv_b = nn.Conv(self.out, (3, 3), padding=1, dtype=self.dtype,
                         name="conv_b")
        if self.packed:
            from ccvpe_tpu.ops.phase_space import (conv3x3_packed,
                                                   depth_to_space)
            cin = x.shape[-1] // 4
            pa = materialized_params(conv_a,
                                     jnp.zeros((1, 4, 4, cin), x.dtype))
            pb = materialized_params(
                conv_b, jnp.zeros((1, 4, 4, self.hidden), x.dtype))
            g = conv3x3_packed(x.astype(self.dtype), pa["kernel"],
                               pa["bias"]).astype(self.dtype)
            y = conv3x3_packed(nn.relu(g), pb["kernel"], pb["bias"])
            return depth_to_space(y, self.out).astype(jnp.float32)
        x = conv_a(x)
        x = nn.relu(x)
        return conv_b(x).astype(jnp.float32)


def pick_strip(hc: int, cap: int = 16) -> int:
    """Largest power-of-two strip <= cap dividing hc (Pallas grid rows)."""
    s = cap
    while s > 1 and hc % s:
        s //= 2
    return s


def materialized_params(mod: nn.Module, *dummy_args):
    """Run `mod` on tiny dummy inputs to materialize its params (dead code
    under jit, DCE'd by XLA; at init time it creates the params with the
    exact same names/shapes/RNG paths as a real call), then return the
    param subtree. Lets a parent compute with a child's weights directly
    (fused kernels) while keeping the checkpoint tree identical."""
    mod(*dummy_args)
    return mod.variables["params"]


class DecoderStage(nn.Module):
    """One LMU stage: deconv -> optional skip concat -> double conv.

    phase=True computes the stage in phase space, pure XLA
    (ops/phase_space.py): the fine map stays 2x2 space-to-depth packed
    (lane dim 4C instead of C), and only the result is unpacked — except
    for the final stage (conv_out=None), which returns the PACKED deconv
    output for a packed HeadConv.

    fused=True instead routes the stage through the fused Pallas kernel
    (ops/lmu_pallas.py; measured slower than XLA at these channel counts,
    kept as the documented waiver artifact — default backward is the
    Pallas one-pass kernel, bwd_impl='pallas', with XLA recompute as the
    cross-check path).

    Parameter tree is identical for all three paths, so the flags can be
    flipped on any checkpoint.
    """

    deconv_out: int
    conv_out: Optional[int]   # None for the final stage (head applied outside)
    dtype: Any = jnp.float32
    deconv_impl: str = "einsum"
    fused: bool = False
    phase: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray]) -> jnp.ndarray:
        deconv = Deconv2x2(self.deconv_out, dtype=self.dtype,
                           impl=self.deconv_impl, name="deconv")
        if self.phase:
            from ccvpe_tpu.ops.phase_space import phase_stage
            dp = materialized_params(deconv, x[:1, :2, :2])
            if self.conv_out is None:
                assert skip is None, "final stage carries no skip"
                return phase_stage(x, None, dp["kernel"], dp["bias"],
                                   None, None, None, None,
                                   dtype=self.dtype, unpack=False)
            cin = self.deconv_out + (0 if skip is None else skip.shape[-1])
            conv = DoubleConv(self.conv_out, dtype=self.dtype, name="conv")
            cp = materialized_params(
                conv, jnp.zeros((1, 4, 4, cin), x.dtype))
            return phase_stage(
                x, skip, dp["kernel"], dp["bias"],
                cp["conv_a"]["kernel"], cp["conv_a"]["bias"],
                cp["conv_b"]["kernel"], cp["conv_b"]["bias"],
                dtype=self.dtype)
        if self.fused and self.conv_out is not None:
            from ccvpe_tpu.ops.lmu_pallas import fused_stage_diff
            dp = materialized_params(deconv, x[:1, :2, :2])
            cin = self.deconv_out + (0 if skip is None else skip.shape[-1])
            conv = DoubleConv(self.conv_out, dtype=self.dtype, name="conv")
            cp = materialized_params(
                conv, jnp.zeros((1, 4, 4, cin), x.dtype))
            y = fused_stage_diff(
                x.astype(self.dtype), skip, dp["kernel"], dp["bias"],
                cp["conv_a"]["kernel"], cp["conv_a"]["bias"],
                cp["conv_b"]["kernel"], cp["conv_b"]["bias"],
                pick_strip(x.shape[1]),
                jax.default_backend() == "cpu")   # interpret mode on CPU
                # (the TPU platform here registers as 'axon', ops/corr.py)
            return y.astype(self.dtype)
        x = deconv(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        if self.conv_out is not None:
            x = DoubleConv(self.conv_out, dtype=self.dtype, name="conv")(x)
        return x
