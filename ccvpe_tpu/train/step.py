"""Jitted, sharded train / eval steps.

Replaces the reference's epoch-loop body (reference train_VIGOR.py:112-150):
GT pyramid construction, forward, the combined loss
CE + w_nce * mean(infoNCE over scales) + w_ori * ori (train_VIGOR.py:146),
backward and Adam update - all inside one XLA program. GT maps are rendered
on-device from per-sample scalars (ccvpe_tpu/ops/gt.py), so the host only
ships images + 3 scalars per sample.

Data parallelism: inputs arrive sharded on the 'data' mesh axis; parameters
are replicated; XLA inserts the gradient all-reduce under jit.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ccvpe_tpu.core.config import ModelConfig, TrainConfig
from ccvpe_tpu.models.cvm import CVM, CVMOutput
from ccvpe_tpu.ops.gt import maxpool_pyramid
from ccvpe_tpu.train.losses import cross_entropy_loss, infonce_loss, orientation_loss


class Batch(NamedTuple):
    """One training batch. Images NHWC: float32 (ImageNet-normalized on the
    host) or uint8 (raw pixels, normalized on device - 4x less H2D traffic);
    offsets/angles are per-sample scalars used for on-device GT rendering."""
    grd: jnp.ndarray          # [B, Hg, Wg, 3]
    sat: jnp.ndarray          # [B, Hs, Ws, 3]
    row_offset: jnp.ndarray   # [B]
    col_offset: jnp.ndarray   # [B]
    angle_deg: jnp.ndarray    # [B] in [0, 360)


# ImageNet normalization constants (data/transforms.py); the on-device
# normalize keeps uint8 ingest numerically identical to the host float path.
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def device_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> ImageNet-normalized float32; float32 passes through
    (already normalized host-side)."""
    if img.dtype != jnp.uint8:
        return img
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_model(model_cfg: ModelConfig) -> CVM:
    return CVM(model_cfg)


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Reference default: plain Adam(1e-4, 0.9, 0.999) (train_VIGOR.py:104);
    optional warmup-cosine schedule, AdamW decay, gradient clipping."""
    if train_cfg.schedule == "warmup_cosine":
        assert train_cfg.total_steps, "warmup_cosine needs total_steps"
        lr = optax.warmup_cosine_decay_schedule(
            0.0, train_cfg.learning_rate, train_cfg.warmup_steps,
            train_cfg.total_steps)
    else:
        lr = train_cfg.learning_rate
    if train_cfg.optimizer == "adamw":
        tx = optax.adamw(lr, b1=train_cfg.beta1, b2=train_cfg.beta2,
                         weight_decay=train_cfg.weight_decay)
    else:
        tx = optax.adam(lr, b1=train_cfg.beta1, b2=train_cfg.beta2)
    if train_cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_norm), tx)
    if train_cfg.flatten_optimizer:
        # Adam/AdamW are elementwise, so updating one raveled+concatenated
        # vector is numerically identical to per-tensor updates - but it
        # replaces ~600 per-parameter update chains (each a handful of tiny
        # HLO ops + DMAs) with a few large fused ops. On this TPU platform
        # per-op overhead dominates the step (device trace: ~43 us/op,
        # docs/PERFORMANCE.md), so op count is a first-order cost.
        tx = optax.flatten(tx)
    return tx


def create_train_state(model_cfg: ModelConfig, train_cfg: TrainConfig,
                       rng: jax.Array) -> Tuple[CVM, TrainState, optax.GradientTransformation]:
    model = CVM(model_cfg)
    hg, wg = model_cfg.grd_size
    hs, ws = model_cfg.sat_size
    variables = model.init(
        rng, jnp.zeros((1, hg, wg, 3)), jnp.zeros((1, hs, ws, 3)), False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(params)
    return model, TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                             opt_state), tx


def _reversed_bins(model_cfg: ModelConfig) -> bool:
    # VIGOR & KITTI use reversed bin order, Oxford forward (SURVEY.md 2.3.9)
    return model_cfg.name != "oxford"


def compute_losses(model_cfg: ModelConfig, train_cfg: TrainConfig,
                   out: CVMOutput, batch: Batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    from ccvpe_tpu.ops.gt import (gaussian_heatmap, gaussian_heatmap_window,
                                  orientation_bin_weights)

    hs, ws = batch.sat.shape[1:3]
    gt = gaussian_heatmap(hs, ws, batch.row_offset, batch.col_offset)
    bin_w = orientation_bin_weights(batch.angle_deg, model_cfg.num_bins,
                                    _reversed_bins(model_cfg))  # [B, K]
    rad = batch.angle_deg * (jnp.pi / 180.0)
    gt_ori = jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)[:, None, None, :]

    b = gt.shape[0]
    gt_flat = gt.reshape(b, -1)
    gt_flat = gt_flat / jnp.sum(gt_flat, axis=1, keepdims=True)

    loss_ce = cross_entropy_loss(out.logits, gt_flat)
    if out.ori_offsets is not None:
        # windowed ori decoding (ModelConfig.ori_window): the loss weight is
        # the SAME Gaussian restricted to the window - exactly zero outside,
        # so the windowed weighted sum equals the full one bit-for-bit
        win = out.ori.shape[1]
        gt_win = gaussian_heatmap_window(
            hs, ws, win, out.ori_offsets[:, 0], out.ori_offsets[:, 1],
            batch.row_offset, batch.col_offset)
        loss_ori = orientation_loss(
            out.ori, jnp.broadcast_to(gt_ori, (b, win, win, 2)), gt_win)
    else:
        loss_ori = orientation_loss(
            out.ori, jnp.broadcast_to(gt_ori, (*gt.shape[:3], 2)), gt)

    nce_terms = []
    for s in out.matching_scores:
        factor = hs // s.shape[1]
        # gt_with_ori = gaussian * w_k with w_k >= 0 per-sample scalars, so
        # maxpool(gaussian * w_k) = w_k * maxpool(gaussian): pool the
        # 1-channel gaussian and outer-product with the bin weights instead
        # of materializing the [B, H, W, K] map (reference builds the full
        # map host-side, datasets.py:153-162 + train_VIGOR.py:123-128).
        (gt_pool,) = maxpool_pyramid(gt, (factor,))       # [B, h, w, 1]
        gt_s = gt_pool * bin_w[:, None, None, :]          # [B, h, w, K]
        # reference flattens NCHW (K, h, w) - order only permutes the sum
        nce_terms.append(infonce_loss(
            s.reshape(b, -1), gt_s.reshape(b, -1), train_cfg.temperature,
            global_negatives=train_cfg.infonce_global_negatives))
    loss_nce = sum(nce_terms) / len(nce_terms)

    total = (loss_ce + train_cfg.weight_infonce * loss_nce
             + train_cfg.weight_ori * loss_ori)
    metrics = {"loss": total, "loss_ce": loss_ce, "loss_infonce": loss_nce,
               "loss_ori": loss_ori}
    return total, metrics


def ori_window_starts(model_cfg: ModelConfig, batch: Batch):
    """Per-sample fine-res window origin for the windowed ori decoder: the
    GT pixel (the Gaussian argmax under ops/gt.py's inclusive-linspace grid)
    centered in a cfg.ori_window box, clamped to the image and snapped to a
    multiple of 4 so the /4-resolution crop start is integral."""
    h, w = model_cfg.sat_size
    win = model_cfg.ori_window
    i_star = (batch.row_offset + h / 2.0) * (h - 1) / h
    j_star = (-batch.col_offset + w / 2.0) * (w - 1) / w
    r0 = jnp.clip(jnp.round(i_star - win / 2.0), 0, h - win)
    c0 = jnp.clip(jnp.round(j_star - win / 2.0), 0, w - win)
    r0 = (r0.astype(jnp.int32) // 4) * 4
    c0 = (c0.astype(jnp.int32) // 4) * 4
    return r0, c0


def make_loss_fn(model: CVM, model_cfg: ModelConfig, train_cfg: TrainConfig):
    def loss_fn(params, batch_stats, batch, rng):
        ori_window = (ori_window_starts(model_cfg, batch)
                      if model_cfg.ori_window else None)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            device_normalize(batch.grd), device_normalize(batch.sat), True,
            mutable=["batch_stats"], rngs={"dropout": rng},
            ori_window=ori_window,
        )
        total, metrics = compute_losses(model_cfg, train_cfg, out, batch)
        return total, (mutated["batch_stats"], metrics)
    return loss_fn


def make_train_step(model: CVM, tx: optax.GradientTransformation,
                    model_cfg: ModelConfig, train_cfg: TrainConfig,
                    donate: bool = True):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    With train_cfg.grad_accum_steps > 1 the batch is processed as that many
    sequential microbatches inside one XLA program (lax.scan over the leading
    microbatch axis), gradients averaged, one optimizer update. Replaces
    nothing in the reference (single-device, batch 8); this is the scale-up
    path for effective batches beyond single-shot memory/compile limits.
    """

    loss_fn = make_loss_fn(model, model_cfg, train_cfg)
    accum = train_cfg.grad_accum_steps

    def grad_one(params, batch_stats, mb: Batch, rng):
        return jax.grad(loss_fn, has_aux=True)(params, batch_stats, mb, rng)

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if accum > 1:
            b = batch.grd.shape[0]
            assert b % accum == 0, (b, accum)
            mbs = Batch(*(x.reshape(accum, b // accum, *x.shape[1:])
                          for x in batch))

            def body(carry, xs):
                mb, idx = xs
                stats, grad_sum = carry
                # fold the microbatch index so dropout / drop-connect masks
                # are independent across microbatches (an effective batch of
                # A*m must draw A*m independent masks, not m repeated A times)
                grads, (stats, metrics) = grad_one(
                    state.params, stats, mb, jax.random.fold_in(rng, idx))
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                return (stats, grad_sum), metrics

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grad_sum), ms = jax.lax.scan(
                body, (state.batch_stats, zeros),
                (mbs, jnp.arange(accum)))
            grads = jax.tree.map(lambda g: g / accum, grad_sum)
            metrics = jax.tree.map(jnp.mean, ms)
        else:
            grads, (new_stats, metrics) = grad_one(
                state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, new_stats, opt_state), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: CVM, model_cfg: ModelConfig):
    """Forward-only step returning (heatmap, ori) for metric computation.

    Full-map outputs: use only where the maps themselves are the product
    (visualization, golden parity). Metric loops must use
    make_eval_decode_step - fetching [B,512,512,*] maps per batch costs
    ~25 MB/batch-8 of D2H for B scalars of information (VERDICT r4)."""

    def step(params, batch_stats, grd, sat):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          device_normalize(grd), device_normalize(sat), False)
        return out.heatmap, out.ori

    return jax.jit(step)


def make_eval_decode_step(model: CVM, model_cfg: ModelConfig):
    """Scalar-only eval step: forward + pose decode + GT location + prob@GT
    fused into ONE jitted dispatch whose outputs are five [B] vectors
    (pred rows/cols, angle deg, GT rows/cols) plus prob@GT - the
    train/stream.py:42-57 precedent applied to every eval loop. Replaces
    the reference's full-map fetch + host numpy argmax per batch
    (reference train_VIGOR.py:182-186)."""
    from ccvpe_tpu.ops import pose

    def step(params, batch_stats, grd, sat, row_offset, col_offset):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          device_normalize(grd), device_normalize(sat), False)
        rows, cols, angle = pose.decode_pose(out.heatmap, out.ori)
        hs, ws = out.heatmap.shape[1:3]
        gt_rows, gt_cols = pose.gt_location_device(
            hs, ws, row_offset, col_offset)
        b = out.heatmap.shape[0]
        prob_gt = out.heatmap[jnp.arange(b), gt_rows, gt_cols, 0]
        return rows, cols, angle, gt_rows, gt_cols, prob_gt

    return jax.jit(step)
