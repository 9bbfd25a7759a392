"""Masked, weighted per-point segmentation loss and metrics.

Reference behavior [H per SURVEY.md §0.6 #7-8]: per-point sparse softmax
cross-entropy averaged over points, optional per-point weights from the
event file; overall and per-class accuracy at report steps. The rebuild
adds an explicit validity mask (padded batching) and mIoU/confusion
matrices (the north-star accuracy metric in BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _point_weights(labels, weights, mask, dtype):
    w = jnp.ones(labels.shape, dtype)
    if mask is not None:
        w = w * mask.astype(dtype)
    if weights is not None:
        w = w * weights.astype(dtype)
    return w


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Weighted mean of per-point cross entropy over valid points.

    Args:
      logits: ``(..., N, num_class)`` float.
      labels: ``(..., N)`` int.
      weights: optional ``(..., N)`` per-point weights.
      mask: optional ``(..., N)`` bool validity.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    w = _point_weights(labels, weights, mask, logits.dtype)
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1e-9)


def accuracy(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Overall per-point accuracy over valid points."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(logits.dtype)
    if mask is None:
        return jnp.mean(correct)
    m = mask.astype(logits.dtype)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1e-9)


def confusion_matrix(
    pred: jax.Array,
    labels: jax.Array,
    num_class: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """``(num_class, num_class)`` counts; rows = truth, cols = prediction."""
    flat_true = labels.reshape(-1).astype(jnp.int32)
    flat_pred = pred.reshape(-1).astype(jnp.int32)
    onehot = (flat_true[:, None] == jnp.arange(num_class, dtype=jnp.int32)).astype(
        jnp.float32
    )
    pred_onehot = (flat_pred[:, None] == jnp.arange(num_class, dtype=jnp.int32)).astype(
        jnp.float32
    )
    if mask is not None:
        onehot = onehot * mask.reshape(-1).astype(jnp.float32)[:, None]
    return onehot.T @ pred_onehot


def per_class_accuracy(cm: jax.Array) -> jax.Array:
    """Recall per class from a confusion matrix; NaN-free (0 where absent)."""
    row = jnp.sum(cm, axis=1)
    return jnp.where(row > 0, jnp.diagonal(cm) / jnp.maximum(row, 1.0), 0.0)


def mean_iou(cm: jax.Array) -> jax.Array:
    """Mean intersection-over-union over classes present in truth or pred."""
    inter = jnp.diagonal(cm)
    union = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present.astype(iou.dtype)), 1.0)
