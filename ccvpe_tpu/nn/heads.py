"""Descriptor heads: ground feature volume -> rotation-indexed 1-D descriptors,
aerial bottleneck volume -> chunked descriptor map.

Ground head (reference models.py:57-97): Conv1x1(1280 -> C) then, in torch,
permute to put W on the channel axis and Conv1x1(H -> 1), then flatten. The
flatten order is (w, c) — index = w*C + c (SURVEY.md 2.3.1) — which is what
makes a channel-roll of the sat descriptor equal an azimuth rotation. In NHWC
the permute disappears: compress channels, contract H with a learned weight,
and flatten the natural (w, c) order.

Aerial head (models.py:102-104, 173-184): split the [gh, gw, 1280] bottleneck
into a grid x grid array of chunks and apply one shared Linear(1280*ch*cw -> D)
to each flattened chunk. The reference's 8x8 Python double-loop becomes a
single reshape + einsum.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class GroundDescriptorHead(nn.Module):
    """[B, H, W, F] -> [B, W*C] with (w, c) flatten order.

    Equivalent computation to models.py:57-62: y[b, w, c] =
    sum_h h_weight[h] * (x[b, h, w, :] @ compress[:, c] + compress_bias[c])
    + h_bias.
    """

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, f = x.shape
        x = nn.Conv(self.channels, (1, 1), name="compress")(x)     # [B,H,W,C]
        # torch Conv2d(H,1,1) over the permuted (0,2,3,1) tensor contracts the
        # H axis with a [1, H] kernel + scalar bias.
        hw = self.param("h_weight", nn.initializers.lecun_normal(), (1, h))
        hb = self.param("h_bias", nn.initializers.zeros, (1,))
        y = jnp.einsum("bhwc,oh->bwc", x, hw) + hb[0]
        return y.reshape(b, w * self.channels)


class SatDescriptorHead(nn.Module):
    """[B, gh, gw, F] -> [B, grid, grid, D] chunked descriptor map."""

    out_dim: int
    grid: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, gh, gw, f = x.shape
        ch, cw = gh // self.grid, gw // self.grid
        # -> [B, grid, grid, ch, cw, F]; flatten each chunk in torch's
        # (C, ch, cw) order so converted Linear weights line up
        # (torch Flatten over [B, F, ch, cw], models.py:102).
        x = x.reshape(b, self.grid, ch, self.grid, cw, f)
        x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gi, gj, F, ch, cw]
        x = x.reshape(b, self.grid, self.grid, f * ch * cw)
        return nn.Dense(self.out_dim, name="linear")(x)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) semantics (models.py:33-40): x / max(||x||, eps).
    Computed in float32 regardless of input dtype (norms are
    cancellation-sensitive under bf16)."""
    x = x.astype(jnp.float32)
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
