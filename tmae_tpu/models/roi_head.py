"""Two-stage RoI head infrastructure (reference
``pcdet/models/roi_heads/roi_head_template.py`` +
``target_assigner/proposal_target_layer.py``).

Static-shape redesign of the template's four pieces:
- proposal_layer: per-sample top-K + greedy rotated NMS into a fixed RoI budget
- sample_rois_for_rcnn / subsample_rois: fixed ROI_PER_IMAGE draw with an exact
  foreground quota; the hard/easy background ratio is enforced in expectation
  through randomized priorities (the reference's np.random permutation sampling
  is equally stochastic, just host-side)
- assign_targets: canonical (RoI-frame) gt boxes, reg validity, iou-interval
  classification labels
- losses: BCE cls + smooth-L1 on locally-encoded residuals + corner loss, and
  the local→global decode used at inference
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.box_coder import limit_period
from ..ops.geometry import boxes_iou3d, nms_bev_mask
from ..ops.losses import corner_loss as corner_loss_fn
from ..ops.losses import weighted_smooth_l1


def _rotate_z(pts, angle):
    """pts [..., 3] rotated by angle [...] around +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = pts[..., 0] * c - pts[..., 1] * s
    y = pts[..., 0] * s + pts[..., 1] * c
    return jnp.stack([x, y, pts[..., 2]], axis=-1)


def proposal_layer(cls_preds, box_preds, valid, nms_cfg, num_out: int):
    """Class-agnostic proposal NMS (roi_head_template.py:45-105).

    cls_preds [B, N, C] (logits or probs — only argmax/max used),
    box_preds [B, N, 7+], valid [B, N] →
    (rois [B, num_out, 7+], roi_scores, roi_labels (1-indexed), roi_mask).
    """
    pre = int(nms_cfg.get('NMS_PRE_MAXSIZE', cls_preds.shape[1]))
    thresh = float(nms_cfg['NMS_THRESH'])

    def one(cp, bp, v):
        scores = jnp.max(cp, axis=-1)
        labels = jnp.argmax(cp, axis=-1) + 1
        scores = jnp.where(v, scores, -jnp.inf)
        top_scores, order = jax.lax.top_k(scores, min(pre, scores.shape[0]))
        boxes = bp[order]
        keep = nms_bev_mask(boxes[:, :7], top_scores,
                            jnp.isfinite(top_scores), thresh, num_out)
        # compact kept entries to the front (sort-free prefix-sum scatter)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep & (rank < num_out), rank, num_out)
        rois = jnp.zeros((num_out + 1, bp.shape[-1]), bp.dtype).at[dest].set(
            boxes, mode='drop')[:num_out]
        rs = jnp.full((num_out + 1,), -jnp.inf).at[dest].set(
            top_scores, mode='drop')[:num_out]
        rl = jnp.zeros((num_out + 1,), jnp.int32).at[dest].set(
            labels[order], mode='drop')[:num_out]
        return rois, jnp.where(jnp.isfinite(rs), rs, 0.0), rl, jnp.isfinite(rs)

    return jax.vmap(one)(cls_preds, box_preds, valid)


def sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, roi_mask,
                         gt_boxes, gt_mask, sampler_cfg):
    """Fixed-size RoI subsampling for the rcnn stage
    (proposal_target_layer.py:64-196). Returns a dict with [B, R] tensors."""
    R = int(sampler_cfg['ROI_PER_IMAGE'])
    fg_per_img = int(round(float(sampler_cfg['FG_RATIO']) * R))
    fg_thresh = min(float(sampler_cfg['REG_FG_THRESH']),
                    float(sampler_cfg['CLS_FG_THRESH']))
    bg_lo = float(sampler_cfg['CLS_BG_THRESH_LO'])
    hard_ratio = float(sampler_cfg.get('HARD_BG_RATIO', 0.8))

    def one(key, roi, score, label, rmask, gt, gmask):
        iou = boxes_iou3d(roi[:, :7], gt[:, :7])
        iou = jnp.where(gmask[None, :] & rmask[:, None], iou, 0.0)
        max_ov = jnp.max(iou, axis=1)
        assign = jnp.argmax(iou, axis=1)
        fg = (max_ov >= fg_thresh) & rmask
        easy_bg = (max_ov < bg_lo) & rmask
        hard_bg = ~fg & ~easy_bg & rmask & (
            max_ov < float(sampler_cfg['REG_FG_THRESH'])
        )
        r = jax.random.uniform(key, max_ov.shape)
        # fg quota first (random among fg), then bg with hard/easy preference
        # expressed through priority bands; leftover fg fills any remainder
        prio = jnp.where(
            fg, 3.0 + r,
            jnp.where(hard_bg, 1.0 + hard_ratio + r,
                      jnp.where(easy_bg, 1.0 + (1.0 - hard_ratio) * r, -1.0)),
        )
        # cap the fg band at fg_per_img: demote the fg beyond the quota
        fg_rank = jnp.where(fg, r, -1.0)
        kth = jnp.sort(fg_rank)[-fg_per_img] if fg_per_img > 0 else 2.0
        overflow_fg = fg & (fg_rank < kth)
        prio = jnp.where(overflow_fg, 0.5 + r, prio)
        _, sel = jax.lax.top_k(prio, R)
        sel_valid = prio[sel] > 0.0
        gt_sel = gt[assign[sel]]
        return {
            'rois': roi[sel],
            'roi_scores': score[sel],
            'roi_labels': label[sel],
            'roi_mask': rmask[sel] & sel_valid,
            'gt_of_rois_src': gt_sel,
            'gt_iou_of_rois': max_ov[sel],
        }

    keys = jax.random.split(rng, rois.shape[0])
    return jax.vmap(one)(keys, rois, roi_scores, roi_labels, roi_mask,
                         gt_boxes, gt_mask)


def assign_roi_targets(rng, rois, roi_scores, roi_labels, roi_mask, gt_boxes,
                       gt_mask, sampler_cfg):
    """Canonical-frame targets (roi_head_template.assign_targets:108-130 +
    proposal_target_layer.forward:13-63)."""
    t = sample_rois_for_rcnn(rng, rois, roi_scores, roi_labels, roi_mask,
                             gt_boxes, gt_mask, sampler_cfg)
    ious = t['gt_iou_of_rois']
    t['reg_valid_mask'] = (
        ious > float(sampler_cfg['REG_FG_THRESH'])
    ) & t['roi_mask']
    score_type = sampler_cfg.get('CLS_SCORE_TYPE', 'roi_iou')
    fg_t, bg_t = (float(sampler_cfg['CLS_FG_THRESH']),
                  float(sampler_cfg['CLS_BG_THRESH']))
    if score_type == 'cls':
        labels = jnp.where(ious > fg_t, 1.0, 0.0)
        labels = jnp.where((ious > bg_t) & (ious < fg_t), -1.0, labels)
    elif score_type == 'roi_iou':
        labels = jnp.where(
            ious > fg_t, 1.0,
            jnp.where(ious < bg_t, 0.0, (ious - bg_t) / (fg_t - bg_t)),
        )
    else:
        raise NotImplementedError(score_type)
    t['rcnn_cls_labels'] = jnp.where(t['roi_mask'], labels, -1.0)

    # gt boxes in each RoI's canonical frame
    gt = t['gt_of_rois_src']
    roi_ry = limit_period(t['rois'][..., 6], offset=0.5, period=2 * jnp.pi)
    ctr = gt[..., :3] - t['rois'][..., :3]
    ctr = _rotate_z(ctr, -roi_ry)
    heading = limit_period(gt[..., 6] - roi_ry, offset=0.5, period=jnp.pi)
    t['gt_of_rois'] = jnp.concatenate(
        [ctr, gt[..., 3:6], heading[..., None]], axis=-1
    )
    return t


def encode_local_residuals(gt_of_rois, rois, coder):
    """Targets against the zero-centered, zero-heading RoI anchor
    (get_box_reg_layer_loss, roi_head_template.py:132-160)."""
    anchors = rois.at[..., 0:3].set(0.0).at[..., 6].set(0.0)
    return coder.encode(gt_of_rois[..., :7], anchors[..., :7])


def decode_rcnn_boxes(rcnn_reg, rois, coder):
    """Local decode + rotate/translate back to world
    (generate_predicted_boxes, roi_head_template.py:231-255)."""
    anchors = rois.at[..., 0:3].set(0.0)
    local = coder.decode(rcnn_reg, anchors[..., :7])
    ctr = _rotate_z(local[..., :3], rois[..., 6])
    # heading residual was encoded against a zero-heading anchor, so decoding
    # against the roi-heading anchor already lands in world heading
    return local.at[..., :3].set(ctr + rois[..., :3])


def roi_head_loss(rcnn_cls, rcnn_reg, targets, coder, loss_cfg):
    """BCE cls + weighted smooth-L1 + corner regularization
    (roi_head_template.py:132-229)."""
    lw = loss_cfg['LOSS_WEIGHTS']
    labels = targets['rcnn_cls_labels']
    cls_valid = (labels >= 0).astype(jnp.float32)
    logits = rcnn_cls[..., 0]
    bce = jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    cls_loss = (bce * cls_valid).sum() / jnp.clip(cls_valid.sum(), 1.0)
    cls_loss = cls_loss * float(lw['rcnn_cls_weight'])

    fg = targets['reg_valid_mask']
    reg_targets = encode_local_residuals(
        targets['gt_of_rois'], targets['rois'], coder
    )
    code = rcnn_reg.shape[-1]
    reg_l = weighted_smooth_l1(
        rcnn_reg, reg_targets[..., :code],
        weights=fg.astype(jnp.float32),
        code_weights=lw.get('code_weights'),
    )
    reg_loss = reg_l.sum() / jnp.clip(fg.sum(), 1) * float(
        lw['rcnn_reg_weight']
    )

    total = cls_loss + reg_loss
    tb = {'rcnn_loss_cls': cls_loss, 'rcnn_loss_reg': reg_loss}
    if loss_cfg.get('CORNER_LOSS_REGULARIZATION', False):
        decoded = decode_rcnn_boxes(rcnn_reg, targets['rois'], coder)
        corner = corner_loss_fn(decoded[..., :7],
                                targets['gt_of_rois_src'][..., :7])
        corner_loss = (corner * fg).sum() / jnp.clip(fg.sum(), 1) * float(
            lw['rcnn_corner_weight']
        )
        total = total + corner_loss
        tb['rcnn_loss_corner'] = corner_loss
    tb['rcnn_loss'] = total
    return total, tb
