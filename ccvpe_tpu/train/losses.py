"""Training losses as pure jittable functions.

Reference semantics (losses.py:4-29), reshaped for XLA:
  * infoNCE used masked_select (data-dependent shape, losses.py:17); here it
    is a where-weighted dense reduction - identical value, static shapes.
  * computed in log-space (log_softmax) instead of exp-then-log - identical
    value, numerically stabler.
Layouts are NHWC: ori/gt maps [B, H, W, C]; scores flattened to [B, N].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def infonce_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                 temperature: float = 0.1,
                 global_negatives: bool = False) -> jnp.ndarray:
    """Contrastive loss over flattened matching scores (losses.py:4-20).

    Positives are elements with GT likelihood > 1e-2, weighted by that
    likelihood:  -sum_i w_i * log softmax(s/T)_i / sum_i w_i.

    global_negatives=False reproduces the reference exactly: the softmax
    denominator is per-sample (losses.py:16), so plain data parallelism
    needs no cross-shard term. global_negatives=True pools the denominator
    over the whole (global) batch - a strictly harder contrastive task; the
    cross-shard reduction is inserted by XLA automatically when the batch is
    sharded.
    """
    if global_negatives:
        logz = jax.nn.logsumexp(scores / temperature)  # scalar over batch+pixels
        logp = scores / temperature - logz
    else:
        logp = jax.nn.log_softmax(scores / temperature, axis=1)
    w = jnp.where(labels > 1e-2, labels, 0.0)
    return -jnp.sum(w * logp) / jnp.sum(w)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Soft-label CE over the flattened heatmap (losses.py:23-24); labels are
    the sum-normalized Gaussian GT (train_VIGOR.py:120-121)."""
    return -jnp.sum(labels * jax.nn.log_softmax(logits, axis=1)) / logits.shape[0]


def orientation_loss(ori: jnp.ndarray, gt_orientation: jnp.ndarray,
                     gt: jnp.ndarray) -> jnp.ndarray:
    """Squared (cos,sin) error weighted per-pixel by the Gaussian GT
    (losses.py:28-29). ori/gt_orientation [B,H,W,2], gt [B,H,W,1]."""
    sq = jnp.sum(jnp.square(gt_orientation - ori), axis=-1, keepdims=True)
    return jnp.sum(sq * gt) / ori.shape[0]
