"""CenterHead: shared conv + per-group separate heads, on-device target assignment,
CenterNet focal/L1 losses, and static-shape decode + rotated NMS.

TPU re-design of ``pcdet/models/dense_heads/center_head.py``: the per-sample,
per-GT host-side target loop (center_head.py:108-232) becomes a vectorized
scatter-max gaussian splat; decode/NMS run with fixed K on device.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import centernet as C
from ..ops import geometry as geo
from .layers import BatchNorm2d, ConvBNReLU


class SeparateHead(nn.Module):
    """Per-target-group conv stacks (center_head.py:11-46). Each head:
    (num_conv-1) x [Conv3x3-BN-ReLU] + Conv3x3; 'hm' final bias init -2.19."""

    head_dict: dict  # name → {out_channels, num_conv}
    use_bias: bool

    @nn.compact
    def __call__(self, x, train: bool):
        out = {}
        for name, hc in self.head_dict.items():
            y = x
            for k in range(hc['num_conv'] - 1):
                # torch-default BN (eps 1e-5, momentum 0.1) in the head convs
                y = ConvBNReLU(
                    x.shape[-1], kernel=3, use_bias=self.use_bias,
                    epsilon=1e-5, momentum=0.9, name=f'{name}_conv{k}',
                )(y, train)
            bias_init = (
                nn.initializers.constant(-2.19)
                if name == 'hm' else nn.initializers.zeros
            )
            y = nn.Conv(
                hc['out_channels'], (3, 3), padding='SAME', use_bias=True,
                bias_init=bias_init, name=f'{name}_out',
            )(y)
            out[name] = y
        return out


class CenterHead(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    voxel_size: tuple
    pc_range: tuple

    @nn.compact
    def __call__(self, spatial_features, train: bool):
        """spatial_features [B, H, W, C] NHWC → list of per-group pred dicts with
        NHWC maps."""
        cfg = self.model_cfg
        shared_ch = cfg['SHARED_CONV_CHANNEL']
        use_bias = cfg.get('USE_BIAS_BEFORE_NORM', False)
        x = nn.Conv(shared_ch, (3, 3), padding='SAME', use_bias=use_bias,
                    name='shared_conv')(spatial_features)
        x = BatchNorm2d(epsilon=1e-5, momentum=0.9, name='shared_bn')(
            x, use_running_average=not train
        )
        x = nn.relu(x)

        head_groups = cfg['CLASS_NAMES_EACH_HEAD']
        sep_cfg = dict(cfg['SEPARATE_HEAD_CFG']['HEAD_DICT'])
        pred_dicts = []
        for gi, names in enumerate(head_groups):
            hd = {k: dict(v) for k, v in sep_cfg.items()}
            hd['hm'] = {
                'out_channels': len(names), 'num_conv': cfg['NUM_HM_CONV'],
            }
            pred_dicts.append(
                SeparateHead(hd, use_bias, name=f'head_{gi}')(x, train)
            )
        return pred_dicts


def sigmoid_clamped(x):
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def focal_loss_centernet(pred, gt):
    """CornerNet-style focal loss (loss_utils.neg_loss_cornernet:274-309);
    pred must be clamp-sigmoided, NCHW or NHWC consistent with gt."""
    pos = (gt == 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_w = jnp.power(1 - gt, 4)
    pos_loss = jnp.log(pred) * jnp.square(1 - pred) * pos
    neg_loss = jnp.log(1 - pred) * jnp.square(pred) * neg_w * neg
    num_pos = jnp.sum(pos)
    pos_loss = jnp.sum(pos_loss)
    neg_loss = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0)
    )


def reg_loss_centernet(pred_maps, inds, targets, mask, code_weights):
    """Masked L1 at center cells (loss_utils.RegLossCenterNet + _reg_loss:323-396).
    pred_maps [B, H, W, D] NHWC; inds [B, M] flat y*W+x; targets [B, M, D]."""
    B, H, W, D = pred_maps.shape
    flat = pred_maps.reshape(B, H * W, D)
    pred = jnp.take_along_axis(flat, inds[..., None].astype(jnp.int32), axis=1)
    m = mask.astype(pred.dtype)[..., None]
    num = jnp.maximum(jnp.sum(m), 1.0)
    l1 = jnp.abs(pred - targets) * m
    per_dim = jnp.sum(l1, axis=(0, 1)) / num  # [D]
    return jnp.sum(per_dim * jnp.asarray(code_weights, pred.dtype))


def _decode_boxes_at_inds(pd, inds, voxel_size, pc_range,
                          feature_map_stride, W):
    """Decode predicted boxes [B, M, 7] at target cells from the head maps —
    the IoU-loss box reconstruction (reference center_head.py:260-274),
    gathered at ``inds`` instead of materializing the full (B, 7, H, W) map."""
    ys = (inds // W).astype(jnp.float32)
    xs = (inds % W).astype(jnp.float32)
    ctr = C.gather_feat_nhwc(pd['center'], inds)
    cz = C.gather_feat_nhwc(pd['center_z'], inds)[..., 0]
    dims = jnp.exp(C.gather_feat_nhwc(pd['dim'], inds))
    rot = C.gather_feat_nhwc(pd['rot'], inds)
    angle = jnp.arctan2(rot[..., 1], rot[..., 0])
    xs = (xs + ctr[..., 0]) * feature_map_stride * voxel_size[0] + pc_range[0]
    ys = (ys + ctr[..., 1]) * feature_map_stride * voxel_size[1] + pc_range[1]
    return jnp.stack(
        [xs, ys, cz, dims[..., 0], dims[..., 1], dims[..., 2], angle], axis=-1)


def center_head_loss(pred_dicts, target_dicts, head_order, loss_weights,
                     iou_cfg=None):
    """Total loss over head groups (center_head.py:239-279).

    ``iou_cfg`` (dict with voxel_size, pc_range, feature_map_stride) enables
    the optional IoU-head loss when a group predicts an ``iou`` map
    (center_head.py:97,260-277): L1 between the iou channel at target cells
    and 2*IoU3D(decoded detached boxes, gt boxes) - 1."""
    from ..ops.losses import centernet_iou_loss

    total = 0.0
    tb = {}
    for gi, (pd, td) in enumerate(zip(pred_dicts, target_dicts)):
        hm = sigmoid_clamped(pd['hm'])
        hm_loss = focal_loss_centernet(hm, td['heatmap'].transpose(0, 2, 3, 1))
        hm_loss = hm_loss * loss_weights['cls_weight']
        reg = jnp.concatenate([pd[k] for k in head_order], axis=-1)
        loc_loss = reg_loss_centernet(
            reg, td['inds'], td['target_boxes'], td['mask'],
            loss_weights['code_weights'],
        ) * loss_weights['loc_weight']
        total = total + hm_loss + loc_loss
        tb[f'hm_loss_head_{gi}'] = hm_loss
        tb[f'loc_loss_head_{gi}'] = loc_loss
        if 'iou' in pd and iou_cfg is not None:
            W = pd['hm'].shape[2]
            pred_boxes = jax.lax.stop_gradient(_decode_boxes_at_inds(
                pd, td['inds'], iou_cfg['voxel_size'], iou_cfg['pc_range'],
                iou_cfg['feature_map_stride'], W))
            iou_pred = C.gather_feat_nhwc(pd['iou'], td['inds'])[..., 0]
            iou_loss = centernet_iou_loss(
                iou_pred, td['mask'], pred_boxes, td['iou_boxes'],
            ) * loss_weights.get('iou_weight', 1.0)
            total = total + iou_loss
            tb[f'iou_loss_head_{gi}'] = iou_loss
    return total, tb


def decode_and_nms(pred_dicts, post_cfg, voxel_size, pc_range,
                   feature_map_stride: int, class_id_maps,
                   nms_on_device: bool = True, exact_topk: bool = True):
    """Static-shape decode + per-sample class-agnostic rotated NMS
    (center_head.py:281-343 + model_nms_utils.py:6-25).

    Returns (boxes [B, K, 7], scores [B, K], labels [B, K] 1-indexed,
    valid [B, K]) with K = MAX_OBJ_PER_SAMPLE; NMS keeps ≤ NMS_POST_MAXSIZE.
    """
    nms_cfg = post_cfg['NMS_CONFIG']
    K = int(post_cfg['MAX_OBJ_PER_SAMPLE'])
    pc = jnp.asarray(pc_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    lim = jnp.asarray(post_cfg['POST_CENTER_LIMIT_RANGE'], jnp.float32)
    score_thresh = float(post_cfg['SCORE_THRESH'])

    # Per-group flat top-K straight off the NHWC logits. The reference's
    # _topk (top-K per class, then top-K over the C x K union,
    # centernet_utils.py:136-151) selects exactly the global top-K over all
    # (cell, class) pairs of the group — any global top-K element is
    # necessarily in its class's top-K — so ONE top-K over the contiguous
    # [B, H*W*Cg] logits gives the same candidate set with no
    # [B,HW,C]→[B,C,HW] relayout and no second sort. Sigmoid is monotonic,
    # so it moves after the gather (K values instead of H*W*C).
    B, H, W, _ = pred_dicts[0]['hm'].shape

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    all_ious = []
    for gi, pd in enumerate(pred_dicts):
        Cg = pd['hm'].shape[-1]
        flat = pd['hm'].reshape(B, H * W * Cg)
        if exact_topk:
            # blocked exact top-K with on-device verification + full-sort
            # fallback (ops/centernet.exact_topk_flat) — exact _topk
            # semantics at ~6x less sort work than lax.top_k over 1.1M
            logits, i_all = C.exact_topk_flat(flat, K)   # [B, K]
        else:
            logits, i_all = jax.lax.approx_max_k(flat, K, recall_target=0.99)
        scores = jax.nn.sigmoid(logits)
        cls = (i_all % Cg).astype(jnp.int32)
        inds = (i_all // Cg).astype(jnp.int32)           # flat cell index
        ys = (inds // W).astype(jnp.float32)
        xs = (inds % W).astype(jnp.float32)
        ctr = C.gather_feat_nhwc(pd['center'], inds)     # [B, K, 2]
        rot = C.gather_feat_nhwc(pd['rot'], inds)
        cz = C.gather_feat_nhwc(pd['center_z'], inds)[..., 0]
        dims = jnp.exp(C.gather_feat_nhwc(pd['dim'], inds))
        angle = jnp.arctan2(rot[..., 1], rot[..., 0])
        if 'iou' in pd:
            # IoU head: map the raw channel to [0, 1] (center_head.py:298-299)
            iou_g = C.gather_feat_nhwc(pd['iou'], inds)[..., 0]
            ious = jnp.clip((iou_g + 1.0) * 0.5, 0.0, 1.0)
        else:
            ious = jnp.ones_like(scores)
        xs = (xs + ctr[..., 0]) * feature_map_stride * vs[0] + pc[0]
        ys = (ys + ctr[..., 1]) * feature_map_stride * vs[1] + pc[1]
        boxes = jnp.concatenate(
            [xs[..., None], ys[..., None], cz[..., None], dims,
             angle[..., None]], axis=-1)
        ok = jnp.all(boxes[..., :3] >= lim[:3], axis=-1)
        ok &= jnp.all(boxes[..., :3] <= lim[3:6], axis=-1)
        ok &= scores > score_thresh
        # local head class → global class id, 1-indexed (center_head.py:316)
        gmap = jnp.asarray(class_id_maps[gi], jnp.int32)
        labels = gmap[jnp.clip(cls, 0, gmap.shape[0] - 1)] + 1
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_labels.append(labels)
        all_valid.append(ok)
        all_ious.append(ious)
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    labels = jnp.concatenate(all_labels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    multi_class = str(nms_cfg.get('NMS_TYPE', 'nms_gpu')) == 'multi_class_nms'
    if multi_class:
        # IoU-rectified per-class scores (model_nms_utils.py:28-33):
        # rect = score^(1-r) * iou^r with a per-class rectifier
        ious_all = jnp.concatenate(all_ious, axis=1)
        rect = jnp.asarray(nms_cfg['IOU_RECTIFIER'], jnp.float32)
        r = rect[jnp.clip(labels - 1, 0, rect.shape[0] - 1)]
        scores = jnp.power(jnp.clip(scores, 1e-8), 1.0 - r) * \
            jnp.power(jnp.clip(ious_all, 1e-8), r)

    # sort by (rectified) score desc (scores of invalid → -1 so they sink)
    s_sort = jnp.where(valid, scores, -1.0)
    order = jnp.argsort(-s_sort, axis=1)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    labels = jnp.take_along_axis(labels, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)

    if not nms_on_device:
        return boxes, scores, labels, valid
    if multi_class:
        # per-class NMS with per-class thresholds (model_nms_utils.py:33-46);
        # candidates stay globally sorted, so each class subset is sorted too
        threshs = list(nms_cfg['NMS_THRESH'])
        posts = nms_cfg['NMS_POST_MAXSIZE']
        posts = (list(posts) if isinstance(posts, (list, tuple))
                 else [int(posts)] * len(threshs))
        keep = jnp.zeros_like(valid)
        for c, (th, po) in enumerate(zip(threshs, posts)):
            v_c = valid & (labels == c + 1)
            k_c = jax.vmap(
                lambda b, s, v, th=th, po=po: geo.nms_bev_mask(
                    b, s, v, float(th), int(po))
            )(boxes, jnp.where(v_c, scores, -1.0), v_c)
            keep = keep | (k_c & v_c)
        return boxes, scores, labels, valid & keep
    keep = jax.vmap(
        lambda b, s, v: geo.nms_bev_mask(
            b, s, v, float(nms_cfg['NMS_THRESH']), int(nms_cfg['NMS_POST_MAXSIZE'])
        )
    )(boxes, jnp.where(valid, scores, -1.0), valid)
    return boxes, scores, labels, valid & keep
