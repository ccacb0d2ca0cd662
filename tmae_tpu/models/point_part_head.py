"""Intra-object part-location point head (reference
``pcdet/models/dense_heads/point_intra_part_head.py``, Part-A2 paper).

Per-point foreground classification + regression of the point's normalized
location inside its gt box ([0,1]^3 canonical coordinates), with an optional
box branch. Batched static-shape targets: ignore band = inside the enlarged
box but not the box itself (point_head_template.assign_stack_targets with
set_ignore_flag=True).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import weighted_smooth_l1
from ..ops.roi_pool import points_in_boxes
from .layers import LinearBNReLU
from .point_head_vote import enlarge_box3d


class PointIntraPartOffsetHead(nn.Module):
    """cls FC stack + part FC stack (+ optional box FC stack)
    (point_intra_part_head.py:13-37, 79-127)."""

    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, point_features, point_mask, train: bool):
        xc = point_features
        for wi, w in enumerate(self.model_cfg.get('CLS_FC', [256, 256])):
            xc = LinearBNReLU(w, name=f'cls_fc{wi}')(xc, point_mask, train)
        cls_preds = nn.Dense(self.num_class, name='cls_out')(xc)
        xp = point_features
        for wi, w in enumerate(self.model_cfg.get('PART_FC', [256, 256])):
            xp = LinearBNReLU(w, name=f'part_fc{wi}')(xp, point_mask, train)
        part_preds = nn.Dense(3, name='part_out')(xp)
        out = {'point_cls_preds': cls_preds, 'point_part_preds': part_preds,
               'point_cls_scores': jnp.max(jax.nn.sigmoid(cls_preds), -1),
               'point_part_offset': jax.nn.sigmoid(part_preds)}
        if self.model_cfg.get('REG_FC') is not None:
            xb = point_features
            for wi, w in enumerate(self.model_cfg['REG_FC']):
                xb = LinearBNReLU(w, name=f'reg_fc{wi}')(xb, point_mask, train)
            code_size = int(
                self.model_cfg.get('TARGET_CONFIG', {})
                .get('BOX_CODER_CONFIG', {}).get('code_size', 8)
            )
            out['point_box_preds'] = nn.Dense(code_size, name='box_out')(xb)
        return out


def point_part_targets(points_xyz, point_mask, gt_boxes, gt_mask,
                       extra_width=(0.2, 0.2, 0.2)):
    """Labels with ignore band + intra-part labels
    (point_head_template.py:53-157 with ret_part_labels=True).
    Returns (cls_labels [B,N] with -1 ignore, part_labels [B,N,3],
    gt_box_of_point [B,N,8])."""
    idx = points_in_boxes(points_xyz, gt_boxes, gt_mask)
    idx = jnp.where(point_mask, idx, -1)
    ext = enlarge_box3d(gt_boxes, extra_width)
    eidx = points_in_boxes(points_xyz, ext, gt_mask)
    eidx = jnp.where(point_mask, eidx, -1)
    box = jnp.take_along_axis(gt_boxes, jnp.clip(idx, 0)[..., None], axis=1)
    fg = idx >= 0
    ignored = (eidx >= 0) & ~fg
    cls = box[..., 7].astype(jnp.int32)
    labels = jnp.where(fg, cls, jnp.where(ignored, -1, 0))
    # canonical [0,1]^3 part coordinates inside the containing box
    off = points_xyz - box[..., :3]
    c, s = jnp.cos(box[..., 6]), jnp.sin(box[..., 6])
    u = off[..., 0] * c + off[..., 1] * s
    v = -off[..., 0] * s + off[..., 1] * c
    canon = jnp.stack([u, v, off[..., 2]], axis=-1)
    part = canon / jnp.clip(box[..., 3:6], 1e-5) + 0.5
    part = jnp.where(fg[..., None], part, 0.0)
    return labels, part, box


def point_part_loss(out, points_xyz, point_mask, gt_boxes, gt_mask,
                    model_cfg, loss_weights=None):
    """Focal cls + BCE part loss (point_head_template.get_cls_layer_loss /
    get_part_layer_loss; point_intra_part_head.py:68-77)."""
    tc = model_cfg.get('TARGET_CONFIG', {})
    labels, part_labels, _ = point_part_targets(
        points_xyz, point_mask, gt_boxes, gt_mask,
        tuple(tc.get('GT_EXTRA_WIDTH', (0.2, 0.2, 0.2))),
    )
    num_class = out['point_cls_preds'].shape[-1]
    logits = out['point_cls_preds']
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0), num_class + 1)[..., 1:]
    pos = (labels > 0) & point_mask
    neg = (labels == 0) & point_mask
    cls_w = (pos | neg).astype(jnp.float32) / jnp.clip(
        pos.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0
    )
    p = jax.nn.sigmoid(logits)
    alpha_w = one_hot * 0.25 + (1 - one_hot) * 0.75
    pt = one_hot * (1 - p) + (1 - one_hot) * p
    bce = jnp.clip(logits, 0) - logits * one_hot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    cls_loss = (alpha_w * pt ** 2 * bce * cls_w[..., None]).sum() / \
        logits.shape[0]

    # part regression: BCE between sigmoid(part preds) and [0,1] labels
    pp = out['point_part_preds']
    part_bce = jnp.clip(pp, 0) - pp * part_labels + jnp.log1p(
        jnp.exp(-jnp.abs(pp))
    )
    part_loss = (part_bce.mean(-1) * pos).sum() / jnp.clip(
        pos.sum().astype(jnp.float32), 1.0
    )
    lw = loss_weights or {'point_cls_weight': 1.0, 'point_part_weight': 1.0}
    total = (cls_loss * lw.get('point_cls_weight', 1.0)
             + part_loss * lw.get('point_part_weight', 1.0))
    return total, {'point_cls_loss': cls_loss, 'point_part_loss': part_loss}
