"""Losses and on-device metrics.

* `label_smoothed_cross_entropy` reproduces torch
  `CrossEntropyLoss(label_smoothing=eps)` exactly: smoothed target
  (1-eps)*onehot + eps/K against log-softmax, mean over the batch
  (ref: ViT/training/train.py:405 criterion construction).
* `confusion_matrix` builds the KxK count matrix on device with one
  segment-sum (one-hot outer accumulation) instead of a host loop over
  predictions — the eval subsystem's per-SNR slicing then reuses the raw
  (pred, label) arrays like the reference does
  (ref: ViT/training/utils.py:311-377).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    shifted = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def label_smoothed_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Mean label-smoothed CE over the batch. logits [B, K], labels [B] int."""
    num_classes = logits.shape[-1]
    logp = log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if smoothing == 0.0:
        return jnp.mean(nll)
    uniform = -jnp.mean(logp, axis=-1)  # expected NLL under uniform target
    loss = (1.0 - smoothing) * nll + smoothing * uniform
    return jnp.mean(loss)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def confusion_matrix(
    preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[K, K] count matrix, rows = true label, cols = prediction (sklearn
    orientation, which the reference's plots use). `weights` (e.g. an SNR
    mask) optionally gates each sample."""
    if weights is None:
        weights = jnp.ones_like(labels, dtype=jnp.float32)
    flat = labels * num_classes + preds
    counts = jax.ops.segment_sum(
        weights.astype(jnp.float32), flat, num_segments=num_classes * num_classes
    )
    return counts.reshape(num_classes, num_classes)


def normalize_confusion_matrix(cm: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize (true-class recall view), guarding empty rows —
    matches the reference's normalize=True heatmaps
    (ref: ViT/training/utils.py:216-281)."""
    row = cm.sum(axis=1, keepdims=True)
    return jnp.where(row > 0, cm / jnp.maximum(row, 1.0), 0.0)
