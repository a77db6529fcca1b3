"""Config tree for the CVM model family and training runs.

The reference hard-codes four nearly-identical model classes
(reference models.py:49 CVM_VIGOR, :346 CVM_VIGOR_ori_prior, :655 CVM_KITTI,
:954 CVM_OxfordRobotCar) and per-script argparse flags with hard-coded dataset
paths (reference train_VIGOR.py:25-35). Here a single dataclass tree covers all
variants; presets give the exact reference hyperparameters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Configuration of one CVM variant.

    Shapes/derived quantities follow the reference exactly; see field comments
    for the source lines.
    """

    name: str = "vigor"

    # --- input geometry ---
    grd_size: Tuple[int, int] = (320, 640)   # ground image H, W (train_VIGOR.py:58)
    sat_size: Tuple[int, int] = (512, 512)   # aerial image H, W (train_VIGOR.py:66)

    # --- backbone ---
    circular: bool = True        # horizontal circular padding on the ground encoder
                                 # (models.py:55; only when FoV==360, train_VIGOR.py:52-55)
    # How circular W padding is realized: 'wrap' materializes the wrapped
    # tensor; 'edgefix' runs the conv with zero W pad and recomputes the <=2
    # wrap-crossing output columns per side exactly (value-equal; saves the
    # full-tensor wrap copies the r4 trace measured at ~23 ms/step).
    circular_impl: str = "wrap"
    backbone_features: int = 1280

    # --- ground descriptor heads (models.py:57-97) ---
    # channels of the 1x1 compress conv per scale; descriptor length per scale
    # is grd_feat_w * channels[i]  (width-major flatten, models.py:57-62)
    grd_desc_channels: Sequence[int] = (64, 32, 16, 8, 4, 2)

    # --- aerial descriptor head (models.py:102-104, 173-184) ---
    sat_desc_dim: int = 1280     # D; 2048 for KITTI (models.py:705)
    sat_grid: int = 8            # 8x8 chunk grid over the bottleneck feature map

    # --- orientation-rolled matching (models.py:191-202 etc.) ---
    num_bins: int = 20                        # K; 16 for KITTI
    roll_shifts: Sequence[int] = (64, 32, 16, 8, 4, 2)  # channel shift per scale
                                              # KITTI: (128,64,32,16,8,8) - the level-6
                                              # shift is 8, not 4 (models.py:910 quirk)
    center_window: bool = False  # Oxford matches the centre slice of the rolled
                                 # map (models.py:1094) instead of the first L chans

    # --- decoders ---
    # per-stage output channels; stage order = coarse(8x8) -> fine(256x256)
    loc_deconv_out: Sequence[int] = (1024, 320, 160, 80, 40, 16)
    loc_conv_out: Sequence[int] = (640, 320, 160, 80, 40)   # double_conv outs, stages 1-5
    ori_deconv_out: Sequence[int] = (1024, 256, 128, 64, 32, 16)
    ori_conv_out: Sequence[int] = (640, 256, 128, 64, 32)
    head_hidden: int = 16        # final conv head 16->16->{1,2} (models.py:125-127)

    # Skip connections are derived in the model as the last backbone block at
    # each spatial resolution; for 512^2 aerial inputs this reproduces the
    # reference's blocks 15,10,4,2,0 with channels 320,112,40,24,16
    # (models.py:167-171).

    # correlation implementation: 'auto' (Pallas on TPU, XLA on CPU),
    # 'xla', or 'pallas'
    corr_impl: str = "auto"

    # keep bfloat16 operands in the fine-scale correlation einsums when the
    # activations are bf16 (f32 accumulation via preferred_element_type) -
    # halves the score-input read traffic (ops/corr.py::rolled_corr
    # allow_bf16). Default off = strict-parity f32 operands.
    corr_bf16: bool = False

    # deconv implementation: 'einsum' (matmul + block reshape) or 'conv'
    # (native lax.conv_transpose) - numerically identical, same param layout;
    # see nn/decoder.py::Deconv2x2
    deconv_impl: str = "einsum"

    # computation dtype for the conv-heavy paths (encoders, decoders);
    # params, BN, correlation, losses stay float32. 'bfloat16' targets the
    # v5e MXU peak; 'float32' for strict parity testing.
    compute_dtype: str = "float32"

    # Rematerialize (jax.checkpoint) each backbone block: trades ~1 extra
    # forward of the encoders in backward for a large cut in stored
    # activations - useful for big batches / big tiles.
    remat_backbone: bool = False
    # with remat_backbone, STORE (don't remat) the first N backbone blocks:
    # the high-res early blocks are the costliest to recompute but have the
    # smallest outputs (nn/efficientnet.py::EfficientNetB0.remat_skip)
    remat_skip_blocks: int = 0
    # remat policy for the remat'd backbone blocks: 'none' (store block
    # boundaries only) or 'save_dw' (also store each depthwise-conv output
    # so backward recompute skips the kxk depthwise convs - trades a few GB
    # at batch 80 for the most expensive recompute ops;
    # nn/efficientnet.py::EfficientNetB0.remat_policy)
    remat_policy: str = "none"
    # Rematerialize each decoder stage as well (the 512^2 activations are the
    # largest); enables batch sizes beyond the remat_backbone ceiling.
    remat_decoder: bool = False

    # Optional mesh axis name for spatial (height) sharding of the decoder
    # activations - the TP analog for large aerial tiles (SURVEY.md 2.4).
    # XLA SPMD partitions the convs and inserts halo exchanges. None = pure DP.
    spatial_axis: Optional[str] = None

    # Optional mesh axis name for orientation-bin sharding of the rolled
    # correlation (the context-parallel analog, SURVEY.md 2.4): the K-bin
    # score volumes and the [K, D] roll matrices are sharded over this axis,
    # XLA SPMD partitions the two matching einsums per bin block, and the
    # max-over-bins reduce inserts the cross-device combine. Requires an
    # ambient mesh (jax.set_mesh) carrying the axis. None = unsharded bins.
    ori_axis: Optional[str] = None

    # --- fused LMU decoder stages (ops/lmu_pallas.py) ---
    # 0 = off. Otherwise route decoder stages (and the final stage + head
    # convs) whose OUTPUT fine resolution >= this value through the fused
    # Pallas kernel: deconv2x2 + skip concat + conv3x3 + relu + conv3x3 in
    # one HBM pass (forward); the default backward is the Pallas one-pass
    # kernel (custom VJP, bwd_impl='pallas', remat semantics with no HBM
    # re-traffic), with XLA recompute as the cross-check path.
    # 256 fuses the two finest stages of both decoders + heads.
    # MEASURED SLOWER than XLA at this model family's channel counts
    # (docs/PERFORMANCE.md "Fused LMU"); kept as the documented waiver
    # artifact. For the production fine-stage speedup use
    # phase_space_min_res below instead.
    # Parameter tree is unchanged - flip freely on any checkpoint. Runs on
    # single-device TPU; on CPU backends the kernel runs in interpret mode
    # (tests). Not compatible with spatial_axis sharding (the pallas_call
    # would be replicated by GSPMD, not partitioned).
    lmu_fused_min_res: int = 0

    # --- phase-space (space-to-depth) fine decoder stages ---
    # 0 = off. Otherwise decoder stages (and the final stage + head convs)
    # whose OUTPUT fine resolution is >= this value are computed in
    # lane-friendly phase space, in pure XLA (nn/decoder.py::DecoderStage):
    # the deconv2x2 emits a [B, H, W, 4*C] phase-packed map directly (one
    # matmul, the fine map is never materialized), the two 3x3 convs run as
    # one 2x2 conv over packed channels per output phase, and only the
    # stage output is unpacked to fine NHWC. This keeps the lane dim of
    # every fine-stage tensor at 4*C (>= 64) instead of C (16..40), which
    # is where XLA's conv emitter was measured at 77-90 GB/s effective of
    # the 819 GB/s HBM peak (docs/PERFORMANCE.md). Numerically identical
    # (same params; tests/test_decoder_impl.py); 256 covers the two finest
    # stages of both decoders. Composes with remat and ori_window.
    phase_space_min_res: int = 0

    # --- train-time orientation-decoder windowing ---
    # The orientation loss weights the (cos, sin) field by the sigma=4 GT
    # Gaussian (losses.py:28-29), which UNDERFLOWS TO EXACTLY ZERO in f32
    # beyond ~58 px from the GT - so at train time the ori decoder's two
    # fine stages only need a window around the GT. With a window of W >=
    # 160 px (Gaussian support 58 + conv receptive-field ring + crop snap,
    # models/cvm.py) the training loss and gradients are EXACTLY those of
    # the full-resolution field; the eval path always computes full res.
    # 0 disables; 224 is the validated default for 512^2 aerial tiles.
    ori_window: int = 0

    # --- ori-prior restricted search (models.py:489, train_VIGOR.py:49) ---
    # None = full K-bin search. Otherwise degrees of orientation noise; the
    # matching loop for localization is restricted to bins
    # range(-n, n+1), n = int(ori_noise / bin_degrees).
    ori_noise: Optional[float] = None

    @property
    def bin_degrees(self) -> float:
        return 360.0 / self.num_bins

    @property
    def grd_feat_hw(self) -> Tuple[int, int]:
        """Backbone output H, W for the ground branch (stride-32 + static-224
        SAME padding arithmetic; verified shapes in SURVEY.md 2.3.2)."""
        from ccvpe_tpu.ops.padding import b0_output_size
        return b0_output_size(self.grd_size)

    @property
    def sat_feat_hw(self) -> Tuple[int, int]:
        from ccvpe_tpu.ops.padding import b0_output_size
        return b0_output_size(self.sat_size)

    @property
    def grd_desc_lens(self) -> Tuple[int, ...]:
        w = self.grd_feat_hw[1]
        return tuple(w * c for c in self.grd_desc_channels)

    @property
    def num_scales(self) -> int:
        return len(self.roll_shifts)

    @property
    def restricted_bins(self) -> Optional[Tuple[int, ...]]:
        """Bin offsets used for localization matching under an orientation
        prior: range(-n, n+1) (models.py:489-499)."""
        if self.ori_noise is None:
            return None
        n = int(self.ori_noise / self.bin_degrees)
        return tuple(range(-n, n + 1))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train_VIGOR.py:25-34,104-109)."""

    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    # optimizer family beyond the reference's plain Adam (default = exact
    # reference recipe): 'adam' | 'adamw'; schedule 'constant' |
    # 'warmup_cosine' (needs total_steps)
    optimizer: str = "adam"
    weight_decay: float = 0.0
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: Optional[int] = None
    grad_clip_norm: Optional[float] = None
    # optax.flatten around the optimizer: numerically identical elementwise
    # updates on one raveled vector instead of ~600 per-tensor chains; a large
    # op-count cut on per-op-overhead-bound TPU platforms (docs/PERFORMANCE.md)
    flatten_optimizer: bool = True
    batch_size: int = 8          # global batch
    # microbatching: split each batch into N sequential microbatches inside
    # the jitted step (lax.scan), averaging gradients before one optimizer
    # update - trains effective batches beyond the HBM / compile-size
    # ceiling (batch 64 is the largest single-shot VIGOR step on one v5e).
    # Gradient mean over microbatches equals the full-batch gradient for the
    # per-sample-mean losses; BN batch statistics are per-microbatch (the
    # standard accumulation semantics), and infonce_global_negatives pools
    # within a microbatch only.
    grad_accum_steps: int = 1
    epochs: int = 15             # VIGOR 15, KITTI 6, Oxford 50
    weight_infonce: float = 1e4
    weight_ori: float = 1e1
    temperature: float = 0.1     # infoNCE temperature (losses.py:4)
    # pool the infoNCE denominator over the global batch (harder negatives);
    # False reproduces the reference's per-sample denominator exactly
    infonce_global_negatives: bool = False
    seed: int = 17
    # --- initialization ---
    # Path to ImageNet EfficientNet-B0 weights (torch .pt/.pth state dict or
    # an .npz of the same keys): fills BOTH encoders before the first step,
    # matching the reference's default init (models.py:55,99,
    # efficientnet_pytorch/utils.py:729-758). The published accuracy depends
    # on this init.
    pretrained_backbone: Optional[str] = None
    # Path to a FULL reference CVM .pt state dict to warm-start every weight
    # from (heads/decoders included); overrides pretrained_backbone.
    warm_start: Optional[str] = None
    # sharding
    data_axis: str = "data"
    model_axis: str = "model"
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    log_every: int = 200
    checkpoint_every_steps: Optional[int] = None  # None = per epoch only
    fake_fail_at_step: Optional[int] = None       # fault injection for resume tests


def vigor(ori_noise: Optional[float] = None, circular: bool = True) -> ModelConfig:
    """CVM_VIGOR / CVM_VIGOR_ori_prior (models.py:49, :346)."""
    return ModelConfig(name="vigor", circular=circular, ori_noise=ori_noise)


def kitti() -> ModelConfig:
    """CVM_KITTI (models.py:655): 16 bins, D=2048, level-6 roll shift 8."""
    return ModelConfig(
        name="kitti",
        grd_size=(256, 1024),
        circular=False,
        grd_desc_channels=(16, 8, 4, 2, 1, 1),
        sat_desc_dim=2048,
        num_bins=16,
        roll_shifts=(128, 64, 32, 16, 8, 8),
        loc_deconv_out=(1024, 256, 128, 64, 32, 16),
        loc_conv_out=(512, 256, 128, 128, 32),   # conv3 outputs 128 (models.py:720)
        ori_deconv_out=(1024, 256, 128, 64, 32, 16),
        ori_conv_out=(512, 256, 128, 64, 32),
    )


def oxford() -> ModelConfig:
    """CVM_OxfordRobotCar (models.py:954): centre-window matching, grd 154x231."""
    return ModelConfig(
        name="oxford",
        grd_size=(154, 231),
        circular=False,
        grd_desc_channels=(32, 16, 8, 4, 2, 1),
        center_window=True,
    )


def tiny(sat: int = 128, grd: Tuple[int, int] = (64, 128)) -> ModelConfig:
    """A miniature config with the same topology, for tests and multi-chip
    dry runs: sat 128^2 -> 4x4 bottleneck, 2x2 chunk grid, 6 decoder stages
    2->4->...->128 (grid * 2^6 = sat, the reference geometry invariant).
    Mirrors the invariant that the scale-i descriptor length equals the
    scale-i sat channel count and roll_shift * num_bins covers the full
    channel circle."""
    return ModelConfig(
        name="tiny",
        grd_size=grd,
        sat_size=(sat, sat),
        circular=True,
        grd_desc_channels=(64, 32, 16, 8, 4, 2),
        sat_desc_dim=256,
        sat_grid=max(1, sat // 64),   # grid * 2^6 = sat (decoder geometry)
        num_bins=4,
        roll_shifts=(64, 32, 16, 8, 4, 2),
        loc_deconv_out=(128, 64, 32, 16, 8, 16),
        loc_conv_out=(128, 64, 32, 16, 8),
        ori_deconv_out=(128, 64, 32, 16, 8, 16),
        ori_conv_out=(128, 64, 32, 16, 8),
    )


PRESETS = {
    "vigor": vigor,
    "kitti": kitti,
    "oxford": oxford,
    "tiny": tiny,
}


def get_model_config(name: str, **kwargs) -> ModelConfig:
    return PRESETS[name](**kwargs)
