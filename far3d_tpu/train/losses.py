"""Loss primitives, all masked/static-shape.

References:
  * sigmoid focal loss (mmdet FocalLoss, used with alpha=.25 gamma=2 weight=2)
  * weighted L1 (mmdet L1Loss)
  * softmax focal DDN depth loss + fg/bg balancer
    (ddn_loss/focalloss.py, ddn_loss/balancer.py)
  * IoU losses for the YOLOX head (mmdet IoULoss mode='square')
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, labels: jax.Array,
                       weights: jax.Array, num_classes: int,
                       alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Per-element focal loss summed over classes.

    labels == num_classes means background (all-zero one-hot, mmdet style).
    logits (..., C), labels (...,) int, weights (...,) -> scalar sum.
    """
    p = jax.nn.sigmoid(logits)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    ce_pos = -jax.nn.log_sigmoid(logits)
    ce_neg = -jax.nn.log_sigmoid(-logits)
    loss = (onehot * alpha * (1 - p) ** gamma * ce_pos
            + (1 - onehot) * (1 - alpha) * p ** gamma * ce_neg)
    return jnp.sum(loss.sum(-1) * weights)


def weighted_l1(pred: jax.Array, target: jax.Array,
                weights: jax.Array) -> jax.Array:
    """Sum of |pred - target| * weights (elementwise weights)."""
    return jnp.sum(jnp.abs(pred - target) * weights)


def softmax_focal_loss(logits: jax.Array, target: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0) -> jax.Array:
    """Multi-class focal loss on softmax probs, per-pixel (focalloss.py:55-130):
    FL = -alpha * (1 - p_t)^gamma * log(p_t). logits (..., C), target (...,) int.
    Returns per-pixel loss (...)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(target, logits.shape[-1], dtype=logits.dtype)
    focal = -alpha * (1.0 - p) ** gamma * logp
    return jnp.sum(onehot * focal, axis=-1)


def ddn_depth_loss(depth_logits: jax.Array, target_bins: jax.Array,
                   fg_mask: jax.Array, fg_weight: float = 13.0,
                   bg_weight: float = 1.0, alpha: float = 0.25,
                   gamma: float = 2.0) -> jax.Array:
    """DDN loss (ddn_loss.py:134-163 + balancer.py:22-52): pixelwise softmax
    focal vs LID bin targets, fg/bg re-weighted, normalized by total pixels.

    depth_logits (..., D+1); target_bins (...,) int; fg_mask (...,) bool.
    """
    loss = softmax_focal_loss(depth_logits, target_bins, alpha, gamma)
    w = jnp.where(fg_mask, fg_weight, bg_weight)
    num_pixels = jnp.asarray(loss.size, loss.dtype)
    return jnp.sum(loss * w) / num_pixels


def bbox_overlaps_xyxy(a: jax.Array, b: jax.Array, eps: float = 1e-6
                       ) -> jax.Array:
    """Pairwise IoU between a (..., N, 4) and b (..., M, 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1]))[..., :, None]
    area_b = ((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))[..., None, :]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, eps)


def iou_loss_square(pred: jax.Array, target: jax.Array,
                    eps: float = 1e-16) -> jax.Array:
    """YOLOX IoU loss, mode='square' (mmdet IoULoss): 1 - iou^2, elementwise
    over aligned boxes (..., 4) xyxy."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    area_t = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = jnp.maximum(area_p + area_t - inter, eps)
    iou = inter / union
    return 1.0 - iou ** 2


def binary_cross_entropy_with_probs(p: jax.Array, target: jax.Array,
                                    eps: float = 1e-12) -> jax.Array:
    """BCE on probabilities (mmdet SimOTA cls cost uses sqrt-probs BCE)."""
    p = jnp.clip(p, eps, 1 - eps)
    return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def bce_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    return -(target * jax.nn.log_sigmoid(logits)
             + (1 - target) * jax.nn.log_sigmoid(-logits))
