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
    ori: jnp.ndarray                 # [B, H, W, 2] (or the GT window when
                                     # ori_window is active, see ori_offsets)
    matching_scores: Tuple[jnp.ndarray, ...]  # per scale [B, h_s, w_s, K]
    ori_offsets: Optional[jnp.ndarray] = None  # [B, 2] fine-res (row0, col0)
                                     # of the ori window; None = full field


def _batch_crop(t: jnp.ndarray, r0: jnp.ndarray, c0: jnp.ndarray,
                size: int) -> jnp.ndarray:
    """Per-sample spatial window: t [B, H, W, C], r0/c0 [B] int32."""
    return jax.vmap(
        lambda img, r, c: jax.lax.dynamic_slice(
            img, (r, c, 0), (size, size, t.shape[-1])))(t, r0, c0)


class CVM(nn.Module):
    """Convolutional cross-view pose estimator, TPU-native."""

    config: ModelConfig

    @nn.compact
    def __call__(self, grd: jnp.ndarray, sat: jnp.ndarray,
                 train: bool = False,
                 ori_window: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 ) -> CVMOutput:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        # During init (batch-1 eager trace) sharding constraints only create
        # degenerate GSPMD shardings on tiny tensors - the r2 dryrun's
        # "involuntary full rematerialization" warnings all came from
        # [1, K, D]-scale init-trace concatenates. Constraints are only
        # meaningful in the real jitted step, so skip them while initializing.
        initializing = self.is_initializing()

        def spatial_constraint(t):
            """Shard activation height over the model axis (TP analog for
            large aerial tiles); XLA SPMD partitions convs + inserts halo
            exchange for the 3x3 kernels. No-op without cfg.spatial_axis."""
            if cfg.spatial_axis is None or t.shape[1] < 8 or initializing:
                return t
            from jax.sharding import PartitionSpec as P
            return jax.lax.with_sharding_constraint(
                t, P(None, cfg.spatial_axis, None, None))

        # --- encoders ---
        grd_feat, _ = EfficientNetB0(circular=cfg.circular, dtype=dtype,
                                     remat=cfg.remat_backbone,
                                     remat_skip=cfg.remat_skip_blocks,
                                     remat_policy=cfg.remat_policy,
                                     circular_impl=cfg.circular_impl,
                                     name="grd_encoder")(grd, train)
        sat_feat, sat_multiscale = EfficientNetB0(circular=False, dtype=dtype,
                                                  remat=cfg.remat_backbone,
                                                  remat_skip=cfg.remat_skip_blocks,
                                                  remat_policy=cfg.remat_policy,
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

        # Fused LMU stages (ops/lmu_pallas.py): route stages whose output
        # resolution is >= cfg.lmu_fused_min_res through the one-HBM-pass
        # Pallas kernel; the final stage's deconv is fused WITH the head's
        # two convs (reference models.py:125-127: deconv1 -> conv1 is one
        # uninterrupted chain, the fattest HBM traffic of the step).
        fuse_min = cfg.lmu_fused_min_res
        if fuse_min:
            assert cfg.spatial_axis is None, \
                "lmu_fused_min_res cannot combine with spatial_axis sharding"

        def stage_fused(res_out: int) -> bool:
            return bool(fuse_min) and res_out >= fuse_min

        # Phase-space fine stages (ops/phase_space.py): stages whose output
        # fine resolution >= cfg.phase_space_min_res run on 2x2 packed
        # [B, H/2, W/2, 4C] layouts in pure XLA; the final stage hands its
        # packed deconv output straight to a packed HeadConv.
        phase_min = cfg.phase_space_min_res
        if phase_min:
            assert not fuse_min, \
                "phase_space_min_res and lmu_fused_min_res are exclusive"

        def stage_phase(res_out: int) -> bool:
            return bool(phase_min) and res_out >= phase_min

        def fused_final_head(z, stage_mod, head_mod):
            from ccvpe_tpu.nn.decoder import materialized_params, pick_strip
            from ccvpe_tpu.ops.lmu_pallas import fused_stage_diff
            dp = materialized_params(stage_mod, z[:1, :2, :2], None)["deconv"]
            hp = materialized_params(
                head_mod,
                jnp.zeros((1, 4, 4, dp["kernel"].shape[-1]), z.dtype))
            return fused_stage_diff(
                z.astype(dtype), None, dp["kernel"], dp["bias"],
                hp["conv_a"]["kernel"], hp["conv_a"]["bias"],
                hp["conv_b"]["kernel"], hp["conv_b"]["bias"],
                pick_strip(z.shape[1]),
                jax.default_backend() == "cpu")   # interpret mode on CPU
                # (the TPU platform here registers as 'axon', ops/corr.py)

        def match(x, scale_idx, bins=None):
            return rolled_corr_dispatch(
                x, grd_descs[scale_idx], shift=cfg.roll_shifts[scale_idx],
                num_bins=cfg.num_bins, center=cfg.center_window, bins=bins,
                impl=cfg.corr_impl,
                ori_axis=None if initializing else cfg.ori_axis,
                allow_bf16=cfg.corr_bf16,
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
            last = s == n - 1
            if last and stage_fused(2 * x.shape[1]):
                logits_map = fused_final_head(
                    x,
                    DecoderStage(cfg.loc_deconv_out[s], None, dtype=dtype,
                                 deconv_impl=cfg.deconv_impl,
                                 name=f"loc_stage{s + 1}"),
                    HeadConv(cfg.head_hidden, 1, dtype=dtype,
                             name="loc_head"))
            else:
                phase_s = stage_phase(2 * x.shape[1])
                x = stage_cls(
                    deconv_out=cfg.loc_deconv_out[s],
                    conv_out=cfg.loc_conv_out[s] if s < n - 1 else None,
                    dtype=dtype, deconv_impl=cfg.deconv_impl,
                    fused=stage_fused(2 * x.shape[1]) and not last,
                    phase=phase_s,
                    name=f"loc_stage{s + 1}",
                )(x, skip)
                x = spatial_constraint(x)
                if last:
                    logits_map = HeadConv(cfg.head_hidden, 1, dtype=dtype,
                                          packed=phase_s,
                                          name="loc_head")(x)

        b = logits_map.shape[0]
        logits = logits_map.reshape(b, -1)
        heatmap = jax.nn.softmax(logits, axis=-1).reshape(logits_map.shape)

        # --- orientation decoder ---
        # Train-time GT windowing (ori_window): from the 2nd-to-last stage
        # on, only a cfg.ori_window-px window around the GT is decoded. The
        # orientation loss weight (sigma-4 Gaussian, losses.py:28-29) is
        # EXACTLY zero in f32 beyond ~58 px, and the window keeps Gaussian
        # support + the convs' receptive-field ring + the /4 crop snap well
        # inside it, so training losses/gradients are bit-equal to decoding
        # the full field (tests/test_ori_window.py). Eval never windows.
        win = cfg.ori_window if ori_window is not None else 0
        if win:
            hs = cfg.sat_size[0]
            assert win >= 160 and win % 4 == 0 and win <= hs, (win, hs)
            r0, c0 = ori_window
        y = jnp.concatenate([scores_full, l2_normalize(sat_desc)], axis=-1)
        for s in range(n):
            full_res = y.shape[1] if not (win and s >= n - 2) else (
                cfg.sat_grid * (2 ** s))
            if win and s == n - 2:
                y = _batch_crop(y, r0 // 4, c0 // 4, win // 4)
            skip = skip_by_size.get(full_res * 2) if s < n - 1 else None
            if win and s >= n - 2 and skip is not None:
                skip = _batch_crop(skip, r0 // 2, c0 // 2, win // 2)
            last = s == n - 1
            if last and stage_fused(2 * y.shape[1]):
                ori_raw = fused_final_head(
                    y,
                    DecoderStage(cfg.ori_deconv_out[s], None, dtype=dtype,
                                 deconv_impl=cfg.deconv_impl,
                                 name=f"ori_stage{s + 1}"),
                    HeadConv(cfg.head_hidden, 2, dtype=dtype,
                             name="ori_head"))
            else:
                phase_s = stage_phase(2 * y.shape[1])
                y = stage_cls(
                    deconv_out=cfg.ori_deconv_out[s],
                    conv_out=cfg.ori_conv_out[s] if s < n - 1 else None,
                    dtype=dtype, deconv_impl=cfg.deconv_impl,
                    fused=stage_fused(2 * y.shape[1]) and not last,
                    phase=phase_s,
                    name=f"ori_stage{s + 1}",
                )(y, skip)
                if not (win and s >= n - 2):
                    y = spatial_constraint(y)
                if last:
                    ori_raw = HeadConv(cfg.head_hidden, 2, dtype=dtype,
                                       packed=phase_s,
                                       name="ori_head")(y)
        ori = l2_normalize(ori_raw)  # per-pixel over (cos, sin) (models.py:341)

        offsets = jnp.stack([r0, c0], axis=-1) if win else None
        return CVMOutput(logits, heatmap, ori, tuple(all_scores), offsets)
