"""Loss library (reference ``pcdet/utils/loss_utils.py``), completing the
functions not already embedded in the heads:

  * weighted smooth-L1 / L1 / sigmoid-CE / softmax-CE (loss_utils.py:76-241)
  * corner loss (loss_utils.py:242-271)
  * CenterNet IoU loss (loss_utils.py:399-419)

All are pure functions over batched fixed-shape arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import boxes_iou3d_aligned


def weighted_smooth_l1(pred, target, weights=None, beta: float = 1.0 / 9.0,
                       code_weights=None):
    """loss_utils.WeightedSmoothL1Loss: elementwise smooth-L1, optional per-code
    weights and per-anchor weights. Returns [..., D] loss."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    ad = jnp.abs(diff)
    loss = jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss

def weighted_l1(pred, target, weights=None, code_weights=None):
    diff = jnp.abs(pred - target)
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    if weights is not None:
        diff = diff * weights[..., None]
    return diff


def weighted_sigmoid_ce(logits, target, weights=None):
    """loss_utils.WeightedBinaryCrossEntropyLoss (mean over class dim)."""
    bce = jnp.clip(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    loss = jnp.mean(bce, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_softmax_ce(logits, one_hot, weights=None):
    """loss_utils.WeightedCrossEntropyLoss."""
    ce = -(jax.nn.log_softmax(logits) * one_hot).sum(-1)
    if weights is not None:
        ce = ce * weights
    return ce


def boxes_to_corners_3d(boxes):
    """[..., 7] → [..., 8, 3] 3D corners (box_utils.boxes_to_corners_3d)."""
    tmpl = jnp.asarray([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], boxes.dtype) / 2.0
    local = tmpl * boxes[..., None, 3:6]
    c, s = jnp.cos(boxes[..., 6])[..., None], jnp.sin(boxes[..., 6])[..., None]
    rx = local[..., 0] * c - local[..., 1] * s
    ry = local[..., 0] * s + local[..., 1] * c
    rot = jnp.stack([rx, ry, local[..., 2]], -1)
    return rot + boxes[..., None, 0:3]


def corner_loss(pred_boxes, gt_boxes, beta: float = 1.0):
    """loss_utils.get_corner_loss_lidar: min over the flipped-heading gt of the
    mean corner smooth-L1. pred/gt [..., 7] → [...]."""
    pc = boxes_to_corners_3d(pred_boxes)
    gc = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[..., 6].add(jnp.pi)
    gcf = boxes_to_corners_3d(gt_flip)

    def huber(d):
        ad = jnp.linalg.norm(d, axis=-1)
        return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)

    d1 = huber(pc - gc).mean(-1)
    d2 = huber(pc - gcf).mean(-1)
    return jnp.minimum(d1, d2)


def centernet_iou_loss(iou_pred, mask, pred_boxes, gt_boxes):
    """loss_utils.IoULossCenterNet: L1 between the predicted IoU channel and
    (2*IoU3D(pred, gt) - 1) at positive cells. iou_pred [B, M], mask [B, M],
    boxes [B, M, 7]. Uses the aligned elementwise IoU (the reference takes
    torch.diagonal of the full pair matrix, loss_utils.py:414)."""
    m = mask.astype(iou_pred.dtype)
    iou = boxes_iou3d_aligned(pred_boxes, gt_boxes)
    target = 2.0 * iou - 1.0
    l1 = jnp.abs(iou_pred - jax.lax.stop_gradient(target)) * m
    return l1.sum() / jnp.maximum(m.sum(), 1e-4)
