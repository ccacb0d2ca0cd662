"""Anchor-based dense head family (SECOND / PointPillars parity).

TPU re-design of the reference ``pcdet/models/dense_heads/anchor_head_{template,
single}.py`` + ``target_assigner/{anchor_generator,axis_aligned_target_assigner}
.py``: anchors are a static grid tensor, target assignment is fully vectorized
(masked argmax instead of index_put loops), and losses are the reference's
sigmoid-focal + smooth-L1-with-sin-difference + direction CE.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.box_coder import ResidualCoder, limit_period, nearest_bev_iou


def generate_anchors(anchor_cfgs, grid_size, pc_range):
    """Static anchor tensors per class (anchor_generator.py:17-71).
    Returns (anchors [num_cls] list of [H, W, num_z, num_rot, 7], thresholds)."""
    nx, ny = int(grid_size[0]), int(grid_size[1])
    out = []
    for cfg in anchor_cfgs:
        stride = int(cfg.get('feature_map_stride', 1))
        fx, fy = nx // stride, ny // stride
        sizes = np.asarray(cfg['anchor_sizes'], np.float32)  # [S, 3]
        rots = np.asarray(cfg['anchor_rotations'], np.float32)  # [R]
        heights = np.asarray(cfg['anchor_bottom_heights'], np.float32)  # [Z]
        align = bool(cfg.get('align_center', False))
        if align:
            x_stride = (pc_range[3] - pc_range[0]) / fx
            y_stride = (pc_range[4] - pc_range[1]) / fy
            x_off, y_off = x_stride / 2, y_stride / 2
        else:
            x_stride = (pc_range[3] - pc_range[0]) / (fx - 1)
            y_stride = (pc_range[4] - pc_range[1]) / (fy - 1)
            x_off = y_off = 0.0
        xs = pc_range[0] + x_off + np.arange(fx) * x_stride
        ys = pc_range[1] + y_off + np.arange(fy) * y_stride
        # [H, W, Z, S, R, 7]; S==1 for standard configs
        S, R, Z = len(sizes), len(rots), len(heights)
        anc = np.zeros((fy, fx, Z, S, R, 7), np.float32)
        anc[..., 0] = xs[None, :, None, None, None]
        anc[..., 1] = ys[:, None, None, None, None]
        anc[..., 2] = heights[None, None, :, None, None] + sizes[None, None, None, :, 2] / 2
        anc[..., 3:6] = sizes[None, None, None, :, None, :]
        anc[..., 6] = rots[None, None, None, None, :]
        out.append(anc.reshape(fy, fx, Z * S * R, 7))
    return out


def assign_anchor_targets(anchors_flat, gt_boxes, gt_mask, gt_labels,
                          class_ids, matched_t, unmatched_t, coder):
    """Vectorized axis-aligned assignment for one sample and one anchor class.

    anchors_flat [A, 7]; gt_* [M]; class_ids: 1-indexed class of this anchor set.
    Returns labels [A] (-1 ignore, 0 bg, cls fg), reg_targets [A, C], weights [A].
    Reproduces ``assign_targets_single`` (axis_aligned_target_assigner.py:132-210).
    """
    A = anchors_flat.shape[0]
    in_class = gt_mask & (gt_labels == class_ids)
    iou = nearest_bev_iou(anchors_flat, gt_boxes[:, :7])  # [A, M]
    iou = jnp.where(in_class[None, :], iou, -1.0)
    any_gt = jnp.any(in_class)

    a2g_idx = jnp.argmax(iou, axis=1)  # [A]
    a2g_max = jnp.max(iou, axis=1)
    g2a_max = jnp.max(iou, axis=0)  # [M]
    g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)
    # anchors achieving a gt's best overlap are force-matched
    force = jnp.any(
        (iou == g2a_max[None, :]) & in_class[None, :] & (g2a_max[None, :] > 0),
        axis=1,
    )
    pos = (a2g_max >= matched_t) | force
    neg = (a2g_max < unmatched_t) & ~force
    labels = jnp.where(pos, class_ids, jnp.where(neg, 0, -1))
    labels = jnp.where(any_gt, labels, 0)

    tgt_boxes = gt_boxes[a2g_idx]
    reg = coder.encode(tgt_boxes, anchors_flat)
    reg = jnp.where((pos & any_gt)[:, None], reg, 0.0)
    weights = (pos & any_gt).astype(jnp.float32)
    return labels, reg, weights


def sigmoid_focal_loss(preds, one_hot, weights, gamma=2.0, alpha=0.25):
    """loss_utils.SigmoidFocalClassification (loss_utils.py:10-73)."""
    p = jax.nn.sigmoid(preds)
    alpha_w = one_hot * alpha + (1 - one_hot) * (1 - alpha)
    pt = one_hot * (1 - p) + (1 - one_hot) * p
    bce = jnp.clip(preds, 0) - preds * one_hot + jnp.log1p(
        jnp.exp(-jnp.abs(preds))
    )
    loss = alpha_w * jnp.power(pt, gamma) * bce
    return loss * weights[..., None]


def smooth_l1(diff, beta=1.0 / 9.0):
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad ** 2 / beta, ad - 0.5 * beta)


class AnchorHeadSingle(nn.Module):
    """1x1 conv cls/box/dir heads over anchors (anchor_head_single.py)."""

    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    grid_size: tuple  # (nx, ny)
    pc_range: tuple

    def setup(self):
        anchor_cfgs = self.model_cfg['ANCHOR_GENERATOR_CONFIG']
        self.anchors = [
            jnp.asarray(a) for a in
            generate_anchors(anchor_cfgs, self.grid_size, self.pc_range)
        ]
        self.num_anchors_per_loc = sum(a.shape[2] for a in self.anchors)
        self.coder = ResidualCoder(
            code_size=7,
            encode_angle_by_sincos=self.model_cfg.get(
                'TARGET_ASSIGNER_CONFIG', {}
            ).get('BOX_CODER_CONFIG', {}).get('encode_angle_by_sincos', False),
        )
        self.conv_cls = nn.Conv(
            self.num_anchors_per_loc * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))),
        )
        self.conv_box = nn.Conv(
            self.num_anchors_per_loc * self.coder.code_size, (1, 1),
            kernel_init=nn.initializers.normal(0.001),
        )
        self.use_dir = self.model_cfg.get('USE_DIRECTION_CLASSIFIER', False)
        if self.use_dir:
            self.num_dir_bins = int(self.model_cfg.get('NUM_DIR_BINS', 2))
            self.conv_dir = nn.Conv(
                self.num_anchors_per_loc * self.num_dir_bins, (1, 1)
            )

    def __call__(self, spatial_features_2d, train: bool):
        x = spatial_features_2d  # [B, H, W, C]
        out = {
            'cls_preds': self.conv_cls(x),
            'box_preds': self.conv_box(x),
        }
        if self.use_dir:
            out['dir_cls_preds'] = self.conv_dir(x)
        return out

    # ---- pure functions over outputs (used by loss/predict wrappers) ----

    def all_anchors_flat(self):
        return jnp.concatenate(
            [a.reshape(-1, 7) for a in self.anchors], axis=0
        )  # anchors concatenated per class along the per-location axis

    def assign_targets(self, gt_boxes, gt_mask):
        """gt_boxes [B, M, 8]; returns dict of [B, A_total] targets."""
        ta_cfg = self.model_cfg['TARGET_ASSIGNER_CONFIG']
        anchor_cfgs = self.model_cfg['ANCHOR_GENERATOR_CONFIG']
        labels_all, reg_all, w_all = [], [], []
        gt_labels = gt_boxes[..., 7].astype(jnp.int32)
        for ci, (cfg_i, anc) in enumerate(zip(anchor_cfgs, self.anchors)):
            cls_id = self.class_names.index(cfg_i['class_name']) + 1
            flat = anc.reshape(-1, 7)

            def one(gb, gm, gl):
                return assign_anchor_targets(
                    flat, gb, gm, gl, cls_id,
                    float(cfg_i['matched_threshold']),
                    float(cfg_i['unmatched_threshold']),
                    self.coder,
                )

            l, r, w = jax.vmap(one)(gt_boxes, gt_mask, gt_labels)
            labels_all.append(
                l.reshape(l.shape[0], anc.shape[0], anc.shape[1], anc.shape[2])
            )
            reg_all.append(
                r.reshape(r.shape[0], anc.shape[0], anc.shape[1], anc.shape[2],
                          self.coder.code_size)
            )
            w_all.append(
                w.reshape(w.shape[0], anc.shape[0], anc.shape[1], anc.shape[2])
            )
        # concatenate per-location (match reference layout: [..., loc*cls] flat)
        labels = jnp.concatenate(labels_all, axis=-1).reshape(
            gt_boxes.shape[0], -1
        )
        regs = jnp.concatenate(reg_all, axis=-2).reshape(
            gt_boxes.shape[0], -1, self.coder.code_size
        )
        ws = jnp.concatenate(w_all, axis=-1).reshape(gt_boxes.shape[0], -1)
        return {'box_cls_labels': labels, 'box_reg_targets': regs,
                'reg_weights': ws}


def anchor_head_loss(head: AnchorHeadSingle, outputs, targets, loss_cfg):
    """cls focal + reg smooth-L1 with sin-difference (+ dir CE)
    (anchor_head_template.py:100-223)."""
    B = outputs['cls_preds'].shape[0]
    num_class = head.num_class
    cls_preds = outputs['cls_preds'].reshape(B, -1, num_class)
    box_preds = outputs['box_preds'].reshape(B, -1, head.coder.code_size)
    labels = targets['box_cls_labels']
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0) * cared
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0)
    cls_weights = cls_weights / pos_norm
    one_hot = jax.nn.one_hot(
        jnp.clip(labels, 0) , num_class + 1
    )[..., 1:]
    lw = loss_cfg['LOSS_WEIGHTS']
    cls_loss = sigmoid_focal_loss(cls_preds, one_hot, cls_weights).sum() / B
    cls_loss = cls_loss * lw['cls_weight']

    reg_weights = positives.astype(jnp.float32) / pos_norm
    # sin(a - b) trick on the angle channel (anchor_head_template.py:135-142)
    anchors = head.all_anchors_flat()[None]
    bp = box_preds
    rt = targets['box_reg_targets']
    sin_p = jnp.sin(bp[..., 6:7]) * jnp.cos(rt[..., 6:7])
    sin_t = jnp.cos(bp[..., 6:7]) * jnp.sin(rt[..., 6:7])
    bp = jnp.concatenate([bp[..., :6], sin_p, bp[..., 7:]], axis=-1)
    rt = jnp.concatenate([rt[..., :6], sin_t, rt[..., 7:]], axis=-1)
    code_w = jnp.asarray(lw['code_weights'])[:head.coder.code_size]
    reg = smooth_l1(bp - rt) * code_w
    loc_loss = (reg.sum(-1) * reg_weights).sum() / B * lw['loc_weight']

    total = cls_loss + loc_loss
    tb = {'rpn_loss_cls': cls_loss, 'rpn_loss_loc': loc_loss}
    if head.use_dir and 'dir_cls_preds' in outputs:
        dir_offset = float(head.model_cfg.get('DIR_OFFSET', 0.78539))
        rot_gt = rt[..., 6] * 0 + targets['box_reg_targets'][..., 6] + anchors[..., 6]
        offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
        dir_targets = jnp.clip(
            (offset_rot / (2 * jnp.pi / head.num_dir_bins)).astype(jnp.int32),
            0, head.num_dir_bins - 1,
        )
        dir_preds = outputs['dir_cls_preds'].reshape(B, -1, head.num_dir_bins)
        dir_oh = jax.nn.one_hot(dir_targets, head.num_dir_bins)
        ce = -(jax.nn.log_softmax(dir_preds) * dir_oh).sum(-1)
        dir_loss = (ce * reg_weights).sum() / B * lw['dir_weight']
        total = total + dir_loss
        tb['rpn_loss_dir'] = dir_loss
    return total, tb


def anchor_head_predict(head: AnchorHeadSingle, outputs):
    """Decode anchors (anchor_head_template.py:224-266). Returns
    (cls_preds [B, A, num_class] raw logits, boxes [B, A, 7])."""
    B = outputs['cls_preds'].shape[0]
    cls_preds = outputs['cls_preds'].reshape(B, -1, head.num_class)
    box_preds = outputs['box_preds'].reshape(B, -1, head.coder.code_size)
    anchors = head.all_anchors_flat()[None]
    boxes = head.coder.decode(box_preds, anchors)
    if head.use_dir and 'dir_cls_preds' in outputs:
        dir_offset = float(head.model_cfg.get('DIR_OFFSET', 0.78539))
        dir_limit = float(head.model_cfg.get('DIR_LIMIT_OFFSET', 0.0))
        dir_preds = outputs['dir_cls_preds'].reshape(B, -1, head.num_dir_bins)
        dir_labels = jnp.argmax(dir_preds, axis=-1)
        period = 2 * jnp.pi / head.num_dir_bins
        rot = limit_period(boxes[..., 6] - dir_offset, dir_limit, period)
        boxes = boxes.at[..., 6].set(
            rot + dir_offset + period * dir_labels.astype(boxes.dtype)
        )
    return cls_preds, boxes


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head anchor head (reference ``dense_heads/anchor_head_multi
    .py``): a shared conv trunk + one small conv head per class group, each
    predicting its own cls/box (and optional dir) maps. Anchors/targets reuse the
    same generator and axis-aligned assigner as AnchorHeadSingle."""

    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    grid_size: tuple  # (nx, ny)
    pc_range: tuple

    def setup(self):
        anchor_cfgs = self.model_cfg['ANCHOR_GENERATOR_CONFIG']
        self.groups = [
            list(g['HEAD_CLS_NAME'])
            for g in self.model_cfg['RPN_HEAD_CFGS']
        ]
        self.anchors = [
            jnp.asarray(a) for a in
            generate_anchors(anchor_cfgs, self.grid_size, self.pc_range)
        ]
        self.cfg_by_name = {c['class_name']: c for c in anchor_cfgs}
        self.coder = ResidualCoder(code_size=7)
        shared_ch = int(self.model_cfg.get('SHARED_CONV_NUM_FILTER', 64))
        self.shared = nn.Conv(shared_ch, (3, 3), padding='SAME',
                              use_bias=False, name='shared_conv')
        self.cls_heads = [
            nn.Conv(self._group_anchors(gi) * len(names), (1, 1),
                    bias_init=nn.initializers.constant(
                        -float(np.log((1 - 0.01) / 0.01))),
                    name=f'cls_head_{gi}')
            for gi, names in enumerate(self.groups)
        ]
        self.box_heads = [
            nn.Conv(self._group_anchors(gi) * self.coder.code_size, (1, 1),
                    kernel_init=nn.initializers.normal(0.001),
                    name=f'box_head_{gi}')
            for gi in range(len(self.groups))
        ]

    def _cls_index(self, name):
        return [c['class_name']
                for c in self.model_cfg['ANCHOR_GENERATOR_CONFIG']].index(name)

    def _group_anchors(self, gi):
        return sum(
            self.anchors[self._cls_index(n)].shape[2] for n in self.groups[gi]
        )

    def __call__(self, spatial_features_2d, train: bool):
        x = nn.relu(self.shared(spatial_features_2d))
        outs = []
        for gi, names in enumerate(self.groups):
            outs.append({
                'cls_preds': self.cls_heads[gi](x),
                'box_preds': self.box_heads[gi](x),
                'head_cls_names': names,
            })
        return outs


def assign_atss_targets(anchors_flat, gt_boxes, gt_mask, coder, topk=9,
                        match_height=False):
    """Adaptive training sample selection for one sample (reference
    ``target_assigner/atss_target_assigner.py:78-141``): per-gt candidate set =
    topk closest anchors; IoU threshold = mean+std of candidate IoUs; candidates
    must also sit inside the gt in BEV (with the reference's swapped l/w check
    preserved); anchors claimed by several gts take the highest IoU, and each
    gt force-claims its best-IoU anchor.

    anchors_flat [A, 7]; gt_boxes [M, 8] (class in col 7); gt_mask [M].
    Returns (cls_labels [A], reg_targets [A, code], reg_weights [A]).
    """
    from ..ops.geometry import boxes_iou3d, boxes_iou_bev

    A, M = anchors_flat.shape[0], gt_boxes.shape[0]
    iou_fn = boxes_iou3d if match_height else boxes_iou_bev
    ious = iou_fn(anchors_flat, gt_boxes[:, :7])            # [A, M]
    ious = jnp.where(gt_mask[None, :], ious, 0.0)
    dist = jnp.linalg.norm(
        anchors_flat[:, None, :3] - gt_boxes[None, :, :3], axis=-1
    )
    dist = jnp.where(gt_mask[None, :], dist, jnp.inf)

    _, topk_idx = jax.lax.top_k(-dist.T, topk)              # [M, K]
    cand_ious = jnp.take_along_axis(ious.T, topk_idx, axis=1)  # [M, K]
    thresh = cand_ious.mean(1) + cand_ious.std(1, ddof=1) + 1e-6
    is_pos = cand_ious >= thresh[:, None]

    # BEV containment of the candidate anchors in their gt (reference keeps
    # the swapped (w, l) half-extent comparison — preserved verbatim)
    cand_xyz = anchors_flat[topk_idx][..., :3]               # [M, K, 3]
    d = cand_xyz[..., :2] - gt_boxes[:, None, :2]
    c, s = jnp.cos(-gt_boxes[:, 6]), jnp.sin(-gt_boxes[:, 6])
    xl = d[..., 0] * c[:, None] - d[..., 1] * s[:, None]
    yl = d[..., 0] * s[:, None] + d[..., 1] * c[:, None]
    half_w, half_l = gt_boxes[:, 4] / 2, gt_boxes[:, 3] / 2
    in_gt = (jnp.abs(xl) <= half_w[:, None]) & (jnp.abs(yl) <= half_l[:, None])
    is_pos = is_pos & in_gt & gt_mask[:, None]

    # scatter the per-gt candidate decisions back to a dense [A, M] mask
    pos_pair = jnp.zeros((A, M), bool).at[
        topk_idx, jnp.arange(M)[:, None]
    ].max(is_pos)
    ious_inf = jnp.where(pos_pair, ious, -jnp.inf)
    a2g_val = jnp.max(ious_inf, axis=1)
    a2g_idx = jnp.argmax(ious_inf, axis=1)

    # each (valid) gt force-claims its highest-IoU anchor
    best_anchor = jnp.where(gt_mask, jnp.argmax(ious, axis=0), A)
    a2g_idx = a2g_idx.at[best_anchor].set(jnp.arange(M), mode='drop')
    a2g_val = a2g_val.at[best_anchor].set(
        jnp.max(ious, axis=0), mode='drop'
    )

    matched = gt_boxes[a2g_idx]
    cls_labels = jnp.where(
        jnp.isfinite(a2g_val), matched[:, 7].astype(jnp.int32), 0
    )
    pos = cls_labels > 0
    reg_targets = coder.encode(matched[:, :7], anchors_flat)
    reg_targets = jnp.where(pos[:, None], reg_targets, 0.0)
    return cls_labels, reg_targets, pos.astype(jnp.float32)
