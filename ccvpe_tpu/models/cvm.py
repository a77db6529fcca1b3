"""The CVM model family: one configurable Flax module covering the reference's
four classes (CVM_VIGOR models.py:49, CVM_VIGOR_ori_prior :346, CVM_KITTI :655,
CVM_OxfordRobotCar :954).

Forward contract (matches the reference tuple at models.py:343):
  (logits_flat, heatmap, ori, scores_1..scores_6)
where heatmap is the softmax over all sat pixels, ori is the per-pixel
L2-normalized (cos, sin) field, and scores_s are the K-channel matching score
stacks per scale (inputs to the multi-scale infoNCE loss).

Output layout is NHWC: heatmap [B, H, W, 1], ori [B, H, W, 2],
scores_s [B, h_s, w_s, K].
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccvpe_tpu.core.config import ModelConfig
from ccvpe_tpu.nn.decoder import DecoderStage, HeadConv
from ccvpe_tpu.nn.efficientnet import EfficientNetB0
from ccvpe_tpu.nn.heads import GroundDescriptorHead, SatDescriptorHead, l2_normalize
from ccvpe_tpu.ops.corr import rolled_corr_dispatch


class CVMOutput(NamedTuple):
    logits: jnp.ndarray              # [B, H*W]
    heatmap: jnp.ndarray             # [B, H, W, 1]
    ori: jnp.ndarray                 # [B, H, W, 2]
    matching_scores: Tuple[jnp.ndarray, ...]  # per scale [B, h_s, w_s, K]


class CVM(nn.Module):
    """Convolutional cross-view pose estimator, TPU-native."""

    config: ModelConfig

    @nn.compact
    def __call__(self, grd: jnp.ndarray, sat: jnp.ndarray,
                 train: bool = False) -> CVMOutput:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        def spatial_constraint(t):
            """Shard activation height over the model axis (TP analog for
            large aerial tiles); XLA SPMD partitions convs + inserts halo
            exchange for the 3x3 kernels. No-op without cfg.spatial_axis."""
            if cfg.spatial_axis is None or t.shape[1] < 8:
                return t
            from jax.sharding import PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                t, P(None, cfg.spatial_axis, None, None))

        # --- encoders ---
        grd_feat, _ = EfficientNetB0(circular=cfg.circular, dtype=dtype,
                                     remat=cfg.remat_backbone,
                                     name="grd_encoder")(grd, train)
        sat_feat, sat_multiscale = EfficientNetB0(circular=False, dtype=dtype,
                                                  remat=cfg.remat_backbone,
                                                  name="sat_encoder")(sat, train)
        # Skip connections: the LAST backbone block at each spatial resolution.
        # For a 512^2 aerial input this selects blocks 15,10,4,2,0 with
        # channels 320,112,40,24,16 - exactly the reference's choice
        # (models.py:167-171) - and generalizes to other geometries.
        skip_by_size = {m.shape[1]: m for m in sat_multiscale}

        # --- descriptors ---
        grd_descs = [
            GroundDescriptorHead(c, name=f"grd_desc{s + 1}")(grd_feat)
            for s, c in enumerate(cfg.grd_desc_channels)
        ]
        sat_desc = SatDescriptorHead(cfg.sat_desc_dim, cfg.sat_grid,
                                     name="sat_desc")(sat_feat)  # [B,g,g,D]

        restricted = cfg.restricted_bins
        stage_cls = (nn.remat(DecoderStage) if cfg.remat_decoder
                     else DecoderStage)

        def match(x, scale_idx, bins=None):
            return rolled_corr_dispatch(
                x, grd_descs[scale_idx], shift=cfg.roll_shifts[scale_idx],
                num_bins=cfg.num_bins, center=cfg.center_window, bins=bins,
                impl=cfg.corr_impl, ori_axis=cfg.ori_axis,
            )

        # --- bottleneck matching ---
        # Localization branch may use a restricted bin range under an
        # orientation prior (models.py:489-499); the orientation branch always
        # sees the full K-bin stack (models.py:501-511). Note the reference
        # RETURNS the full stack at the bottleneck (the restricted one is
        # consumed only by the max; the variable is reassigned at
        # models.py:508-511) while scales 2..6 return restricted stacks.
        scores_full = match(sat_desc, 0)
        scores_loc = match(sat_desc, 0, bins=restricted) if restricted else scores_full
        all_scores: List[jnp.ndarray] = [scores_full]

        # --- localization decoder with per-scale matching ---
        x = sat_desc
        n = cfg.num_scales
        for s in range(n):
            if s > 0:
                scores_s = match(x, s, bins=restricted)
                all_scores.append(scores_s)
            else:
                scores_s = scores_loc
            score_max = jnp.max(scores_s, axis=-1, keepdims=True)
            x = jnp.concatenate([score_max, l2_normalize(x)], axis=-1)
            skip = skip_by_size.get(x.shape[1] * 2) if s < n - 1 else None
            x = stage_cls(
                deconv_out=cfg.loc_deconv_out[s],
                conv_out=cfg.loc_conv_out[s] if s < n - 1 else None,
                dtype=dtype, deconv_impl=cfg.deconv_impl,
                name=f"loc_stage{s + 1}",
            )(x, skip)
            x = spatial_constraint(x)
        logits_map = HeadConv(cfg.head_hidden, 1, dtype=dtype,
                              name="loc_head")(x)

        b = logits_map.shape[0]
        logits = logits_map.reshape(b, -1)
        heatmap = jax.nn.softmax(logits, axis=-1).reshape(logits_map.shape)

        # --- orientation decoder ---
        y = jnp.concatenate([scores_full, l2_normalize(sat_desc)], axis=-1)
        for s in range(n):
            skip = skip_by_size.get(y.shape[1] * 2) if s < n - 1 else None
            y = stage_cls(
                deconv_out=cfg.ori_deconv_out[s],
                conv_out=cfg.ori_conv_out[s] if s < n - 1 else None,
                dtype=dtype, deconv_impl=cfg.deconv_impl,
                name=f"ori_stage{s + 1}",
            )(y, skip)
            y = spatial_constraint(y)
        ori = HeadConv(cfg.head_hidden, 2, dtype=dtype, name="ori_head")(y)
        ori = l2_normalize(ori)   # per-pixel over (cos, sin) (models.py:341)

        return CVMOutput(logits, heatmap, ori, tuple(all_scores))
