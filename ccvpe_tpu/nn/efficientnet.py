"""EfficientNet-B0 feature extractor in Flax (NHWC, TPU-native).

Re-designed from the behavior of the reference backbone
(reference efficientnet_pytorch/model.py:34-326, utils.py:627-673):
stem conv s2 -> 16 MBConv blocks -> 1x1 head conv to 1280 channels, each
MBConv = [expand 1x1 + BN + swish] -> depthwise conv + BN + swish -> SE ->
project 1x1 + BN -> drop-connect + residual. All convs use the static-224
SAME padding constants (see ccvpe_tpu/ops/padding.py); the ground branch may
use horizontal-circular padding for 360-degree panoramas (model.py:5).

Differences from the reference implementation (intentional, TPU-first):
  * NHWC layout, channels on the TPU lane dimension.
  * Padding is baked to per-layer compile-time constants.
  * Returns the head features and all 16 block outputs in one pass
    (the reference has separate extract_features / extract_features_multiscale).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccvpe_tpu.ops.padding import (B0_BLOCKS, B0_STEM, conv_circular_same,
                                   pad_same, traced_same_pads)

# Per-block (expand_ratio, input_filters, output_filters, kernel, stride),
# decoded from the B0 block-args strings (utils.py:647-655) with num_repeat
# expanded (model.py:186-203).
B0_BLOCK_SPECS: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 32, 16, 3, 1),
    (6, 16, 24, 3, 2), (6, 24, 24, 3, 1),
    (6, 24, 40, 5, 2), (6, 40, 40, 5, 1),
    (6, 40, 80, 3, 2), (6, 80, 80, 3, 1), (6, 80, 80, 3, 1),
    (6, 80, 112, 5, 1), (6, 112, 112, 5, 1), (6, 112, 112, 5, 1),
    (6, 112, 192, 5, 2), (6, 192, 192, 5, 1), (6, 192, 192, 5, 1), (6, 192, 192, 5, 1),
    (6, 192, 320, 3, 1),
)
SE_RATIO = 0.25          # utils.py:648-654
BN_EPS = 1e-3            # utils.py:666
BN_MOMENTUM = 0.99       # utils.py:665
DROP_CONNECT_RATE = 0.2  # utils.py:628


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


class BatchNorm(nn.Module):
    """flax BatchNorm with f32 statistics/EMA (parity-critical; torch
    matches at rtol 2e-4, tests/test_train_parity.py) but the normalized
    OUTPUT cast back to `dtype`: without the cast the f32-promoted result
    is what XLA materializes and re-reads on the 6x-expanded tensors -
    measured as multi-ms f32[...,6C] fusion outputs in the r4 trace."""

    eps: float = BN_EPS
    momentum: float = BN_MOMENTUM
    dtype: Any = None   # None = keep flax's promoted (f32) output

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)
        return y if self.dtype is None else y.astype(self.dtype)


class CircularSameConv(nn.Module):
    """Bias-free conv with horizontal-circular SAME padding, implemented as a
    zero-pad conv plus exact edge-column recompute (ops/padding.py
    conv_circular_same) so the wrapped tensor is never materialized.

    Drop-in weight-compatible with the nn.Conv it replaces: the single
    "kernel" param has the identical path, shape, init and param dtype, so
    checkpoints / torch-converted weights (utils/torch_convert.py) load
    unchanged whichever impl is configured.
    """

    features: int
    kernel: int
    stride: int
    pad_h: Tuple[int, int]
    pad_w: Tuple[int, int]
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin // self.groups, self.features),
            jnp.float32)
        return conv_circular_same(x, w.astype(self.dtype), self.stride,
                                  self.pad_h, self.pad_w, groups=self.groups)


class SqueezeExcite(nn.Module):
    """SE: global avg pool -> reduce 1x1 -> swish -> expand 1x1 -> sigmoid gate
    (model.py:112-118)."""

    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype) * x


class MBConv(nn.Module):
    """Mobile inverted bottleneck block (model.py:34-131)."""

    expand_ratio: int
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    pad_h: Tuple[int, int]
    pad_w: Tuple[int, int]
    circular: bool
    drop_rate: float
    dtype: Any = jnp.float32
    # 'wrap' materializes the wrapped tensor (jnp.pad mode='wrap');
    # 'edgefix' uses CircularSameConv (zero-pad conv + edge recompute).
    circular_impl: str = "wrap"

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        mid = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = BatchNorm(name="bn0", dtype=self.dtype)(x, train)
            x = swish(x)
        # Zero padding rides the conv's own padding config (free - no
        # materialized pad pass over the 6x-expanded tensor; the r4 trace
        # showed ~30 ms/step of explicit pad copies). Only the circular
        # W-wrap needs a real pad (no wrap mode in conv windows).
        x = x.astype(self.dtype)
        if self.circular and self.circular_impl == "edgefix":
            x = CircularSameConv(
                features=mid, kernel=self.kernel, stride=self.stride,
                pad_h=self.pad_h, pad_w=self.pad_w, groups=mid,
                dtype=self.dtype, name="depthwise_conv")(x)
        else:
            if self.circular:
                x = pad_same(x, (0, 0), self.pad_w, circular=True)
            x = nn.Conv(
                mid, (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=(self.pad_h, (0, 0) if self.circular else self.pad_w),
                use_bias=False, feature_group_count=mid,
                dtype=self.dtype, name="depthwise_conv",
            )(x)
        # Named so the save_dw remat policy can store it: the k x k
        # depthwise conv is the block's most expensive op to recompute
        # (25 taps/value for k=5 on the VPU), while its output is needed
        # again in backward (bn1's stats grad). See EfficientNetB0.remat.
        from jax.ad_checkpoint import checkpoint_name
        x = checkpoint_name(x, "dw_out")
        x = BatchNorm(name="bn1", dtype=self.dtype)(x, train)
        x = swish(x)
        x = SqueezeExcite(max(1, int(self.in_filters * SE_RATIO)),
                          dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x.astype(self.dtype))
        x = BatchNorm(name="bn2", dtype=self.dtype)(x, train)
        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_rate > 0:
                # drop-connect / stochastic depth (utils.py:129-154)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype)
                )
                x = x / keep * mask
            x = x + inputs.astype(x.dtype)
        return x


class EfficientNetB0(nn.Module):
    """B0 feature extractor returning (head_features, [16 block outputs])."""

    circular: bool = False
    head_features: int = 1280
    dtype: Any = jnp.float32
    remat: bool = False
    # With remat on, do NOT remat the first N blocks: the early high-res
    # blocks (256^2/128^2 for a 512^2 input) are the most expensive to
    # recompute but their outputs are small (few channels), so storing them
    # buys back their entire backward recompute for a few hundred MB.
    remat_skip: int = 0
    # Remat policy for the remat'd blocks: 'none' stores only block
    # boundaries (max memory saving, full in-block recompute); 'save_dw'
    # additionally stores each block's depthwise-conv output (the
    # checkpoint_name above) so backward recompute skips the k x k
    # depthwise convs - ~6x-channel tensors at output resolution, a few GB
    # at batch 80, bought back as tens of ms of recompute.
    remat_policy: str = "none"
    # See MBConv.circular_impl; applies to the stem + every depthwise conv.
    circular_impl: str = "wrap"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        pads = traced_same_pads()
        (ph, pw) = pads[0]
        x = x.astype(self.dtype)
        if self.circular and self.circular_impl == "edgefix":
            x = CircularSameConv(features=32, kernel=3, stride=2, pad_h=ph,
                                 pad_w=pw, dtype=self.dtype,
                                 name="stem_conv")(x)
        else:
            if self.circular:
                x = pad_same(x, (0, 0), pw, circular=True)
            x = nn.Conv(32, (3, 3), strides=(2, 2),
                        padding=(ph, (0, 0) if self.circular else pw),
                        use_bias=False, dtype=self.dtype,
                        name="stem_conv")(x)
        x = BatchNorm(name="stem_bn", dtype=self.dtype)(x, train)
        x = swish(x)

        policy = (jax.checkpoint_policies.save_only_these_names("dw_out")
                  if self.remat_policy == "save_dw" else None)
        remat_cls = nn.remat(MBConv, static_argnums=(2,), policy=policy)
        multiscale = []
        n = len(B0_BLOCK_SPECS)
        for i, (e, cin, cout, k, s) in enumerate(B0_BLOCK_SPECS):
            ph, pw = pads[1 + i]
            block_cls = (remat_cls if self.remat and i >= self.remat_skip
                         else MBConv)
            x = block_cls(
                expand_ratio=e, in_filters=cin, out_filters=cout, kernel=k,
                stride=s, pad_h=ph, pad_w=pw, circular=self.circular,
                circular_impl=self.circular_impl,
                drop_rate=DROP_CONNECT_RATE * i / n,   # model.py:262-264
                dtype=self.dtype, name=f"block{i}",
            )(x, train)
            multiscale.append(x)

        x = nn.Conv(self.head_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="head_conv")(x.astype(self.dtype))
        x = BatchNorm(name="head_bn", dtype=self.dtype)(x, train)
        x = swish(x)
        return x, multiscale
