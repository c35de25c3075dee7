"""Detection losses (fp32, mask-aware).

Parity with the reference's loss_utils: FocalLossCenterNet (CornerNet focal,
loss_utils.py:335-395) and RegLossCenterNet (masked L1 at target indices,
loss_utils.py:397-420), re-expressed over static-shape masked tensors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_clamped(x, eps: float = 1e-4):
    """Reference's clamped sigmoid (center_head.py:233-235)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def focal_loss_centernet(pred, gt):
    """CornerNet-style focal loss on gaussian heatmaps.

    Args:
        pred: (..., ) probabilities (already sigmoid-clamped), any shape.
        gt: same shape, gaussian-splatted targets in [0, 1].
    Returns:
        scalar loss (normalized by the number of positives).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    pos_mask = (gt >= 1.0).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos_mask
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg_mask

    num_pos = jnp.sum(pos_mask)
    pos_loss = jnp.sum(pos_loss)
    neg_loss = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0)
    )


def reg_loss_centernet(pred_feat, target, inds, mask):
    """Masked L1 at heatmap indices, per code dimension.

    Args:
        pred_feat: (B, H*W, D) regression maps flattened over space.
        target: (B, M, D) per-box regression targets.
        inds: (B, M) int cell indices into H*W.
        mask: (B, M) bool/float — live boxes.
    Returns:
        (D,) per-dimension loss (reference _reg_loss semantics: sum of masked
        |err| per dim divided by total positive count).
    """
    pred = jnp.take_along_axis(
        pred_feat.astype(jnp.float32), inds[..., None], axis=1
    )  # (B, M, D)
    m = mask.astype(jnp.float32)[..., None]
    target = target.astype(jnp.float32)
    not_nan = jnp.isfinite(target).astype(jnp.float32)
    m = m * not_nan
    err = jnp.abs(pred * m - target * m)
    num = jnp.sum(mask.astype(jnp.float32))
    return jnp.sum(err, axis=(0, 1)) / (num + 1e-4)


def sigmoid_focal_loss(pred_logits, target_onehot, weights, gamma: float = 2.0,
                       alpha: float = 0.25):
    """SigmoidFocalClassificationLoss (loss_utils.py:10-74) — elementwise,
    weighted per anchor.

    Args:
        pred_logits: (B, A, C)
        target_onehot: (B, A, C)
        weights: (B, A)
    Returns:
        (B, A, C) loss.
    """
    pred_logits = pred_logits.astype(jnp.float32)
    target = target_onehot.astype(jnp.float32)
    pred_sigmoid = jax.nn.sigmoid(pred_logits)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    # numerically-stable BCE with logits
    bce = jnp.clip(pred_logits, 0) - pred_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    return focal_weight * bce * weights[..., None]


def weighted_smooth_l1(pred, target, weights, beta: float = 1.0 / 9.0,
                       code_weights=None):
    """WeightedSmoothL1Loss (loss_utils.py:76-128).

    Args:
        pred, target: (B, A, D)
        weights: (B, A)
    Returns:
        (B, A, D)
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, jnp.float32)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    return loss * weights[..., None]


def weighted_cross_entropy(pred_logits, target_onehot, weights):
    """WeightedCrossEntropyLoss (loss_utils.py:183-208): per-anchor CE.

    Args:
        pred_logits: (B, A, C), target_onehot: (B, A, C), weights: (B, A)
    """
    logprob = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(target_onehot * logprob, axis=-1)
    return ce * weights
