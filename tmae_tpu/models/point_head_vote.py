"""VoteNet-style point head for SSD3D (reference
``pcdet/models/dense_heads/point_head_vote.py``).

Batched static-shape re-design: seeds are a static slice of the backbone's
point set, vote offsets are clipped per-axis, votes are aggregated with a
fusion-sampling SA module evaluated at the vote positions, and three FC stacks
produce shared/cls/box predictions. Targets (vote cls/box with ball constraint,
seed centers, aux fg labels — point_head_template.py:53-157) and the five loss
terms (aux cls, seed reg, vote cls with centerness, vote reg with heading bins,
corner — point_head_vote.py:164-330) are computed with masks instead of
boolean indexing so everything jits with fixed shapes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.box_coder import PointBinResidualCoder
from ..ops.losses import boxes_to_corners_3d, weighted_smooth_l1
from ..ops.roi_pool import points_in_boxes
from .layers import LinearBNReLU
from .pointnet2_backbone import SetAbstractionFSMSG


def enlarge_box3d(boxes, extra_width):
    """boxes [..., 7+] grown by (ex, ey, ez) on dims (box_utils.py:145-158)."""
    ex = jnp.asarray(extra_width, boxes.dtype)
    return boxes.at[..., 3:6].add(ex)


def generate_centerness_mask(pts, boxes):
    """Per-point centerness in its gt box, cube-rooted (box_utils.py:301-321).
    pts [..., 3], boxes [..., 7] → [...]."""
    off = pts - boxes[..., 0:3]
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    u = off[..., 0] * c + off[..., 1] * s
    v = -off[..., 0] * s + off[..., 1] * c
    canon = jnp.stack([u, v, off[..., 2]], axis=-1)
    half = boxes[..., 3:6] / 2
    dist_min = jnp.minimum(half - canon, half + canon)
    dist_max = jnp.maximum(half - canon, half + canon)
    centerness = dist_min / jnp.clip(dist_max, 1e-6)
    centerness = centerness[..., 0] * centerness[..., 1] * centerness[..., 2]
    return jnp.power(jnp.clip(centerness, 1e-6), 1.0 / 3)


def _first_box_labels(pts, pmask, gt_boxes, gt_mask):
    """First containing gt box per point: (idx [B,N] or -1, box [B,N,8])."""
    idx = points_in_boxes(pts, gt_boxes, gt_mask)
    idx = jnp.where(pmask, idx, -1)
    box = jnp.take_along_axis(
        gt_boxes, jnp.clip(idx, 0)[..., None], axis=1
    )
    return idx, box


class PointHeadVote(nn.Module):
    """Vote generation + vote feature aggregation + cls/box prediction
    (point_head_vote.py:9-57, 331-412)."""

    model_cfg: Any
    num_class: int

    def coder(self):
        return PointBinResidualCoder(
            **dict(self.model_cfg['TARGET_CONFIG']['BOX_CODER_CONFIG'])
        )

    @nn.compact
    def __call__(self, point_coords, point_mask, point_features, train: bool):
        """point_coords [B, N, 3], point_features [B, N, C] →
        dict(seeds, votes [B, K, 3], vote mask, cls/box preds [B, K, .])."""
        vc = self.model_cfg['VOTE_CONFIG']
        r0, r1 = [int(v) for v in vc['SAMPLE_RANGE']]
        seeds = point_coords[:, r0:r1]           # [B, K, 3]
        seed_mask = point_mask[:, r0:r1]
        x = point_features[:, r0:r1]
        for wi, w in enumerate(vc['MLPS']):
            x = LinearBNReLU(w, name=f'vote_mlp{wi}')(x, seed_mask, train)
        offsets = nn.Dense(3, name='vote_out')(x)
        rng = jnp.asarray(vc['VOTE_XYZ_RANGE'], offsets.dtype)
        offsets = jnp.clip(offsets, -rng, rng)
        votes = seeds + offsets

        sa = self.model_cfg['VOTE_SA_CONFIG']
        _, _, vote_feat = SetAbstractionFSMSG(
            radii=list(sa['RADIUS']),
            nsamples=list(sa['NSAMPLE']),
            mlps=[list(m) for m in sa['MLPS']],
            name='vote_sa',
        )(point_coords, point_mask, point_features, train,
          new_xyz=votes, new_mask=seed_mask)

        x = vote_feat
        for wi, w in enumerate(self.model_cfg.get('SHARED_FC', [])):
            x = LinearBNReLU(w, name=f'shared_fc{wi}')(x, seed_mask, train)
        xc = x
        for wi, w in enumerate(self.model_cfg.get('CLS_FC', [])):
            xc = LinearBNReLU(w, name=f'cls_fc{wi}')(xc, seed_mask, train)
        cls_preds = nn.Dense(self.num_class, name='cls_out')(xc)
        xb = x
        for wi, w in enumerate(self.model_cfg.get('REG_FC', [])):
            xb = LinearBNReLU(w, name=f'reg_fc{wi}')(xb, seed_mask, train)
        box_preds = nn.Dense(self.coder().code_size, name='box_out')(xb)
        return {
            'seeds': seeds,
            'votes': votes,
            'vote_mask': seed_mask,
            'vote_cls_preds': cls_preds,
            'vote_box_preds': box_preds,
        }


def point_head_vote_targets(out, gt_boxes, gt_mask, coder, model_cfg,
                            num_class):
    """Masked equivalents of PointHeadVote.assign_targets
    (point_head_vote.py:96-163)."""
    tc = model_cfg['TARGET_CONFIG']
    votes, vmask = out['votes'], out['vote_mask']
    seeds = out['seeds']
    # --- vote targets: containing box + ball constraint around its center ---
    vidx, vbox = _first_box_labels(votes, vmask, gt_boxes, gt_mask)
    radius = float(tc.get('GT_CENTRAL_RADIUS', 2.0))
    near = jnp.linalg.norm(
        vbox[..., :3] - votes, axis=-1
    ) < radius
    fg = (vidx >= 0) & near
    ignored = (vidx >= 0) & ~near
    cls = vbox[..., 7].astype(jnp.int32) if num_class > 1 else jnp.ones(
        vidx.shape, jnp.int32
    )
    vote_cls_labels = jnp.where(fg, cls, jnp.where(ignored, -1, 0))
    vote_box_labels = coder.encode(
        vbox[..., :7], votes, vbox[..., 7].astype(jnp.int32)
    )
    vote_box_labels = jnp.where(fg[..., None], vote_box_labels, 0.0)
    # --- seed targets: inside the enlarged gt boxes ---
    ext = enlarge_box3d(gt_boxes, tc['GT_EXTRA_WIDTH'])
    sidx, sbox = _first_box_labels(seeds, vmask, ext, gt_mask)
    return {
        'vote_cls_labels': vote_cls_labels,
        'vote_fg': fg,
        'vote_box_labels': vote_box_labels,
        'gt_box_of_fg_votes': vbox,
        'seed_fg': sidx >= 0,
        'gt_box_of_fg_seeds': sbox,
    }


def point_head_vote_loss(out, gt_boxes, gt_mask, coder, model_cfg, num_class):
    """The five-term PointHeadVote loss (point_head_vote.py:164-330); the aux
    cls term is zero because this backbone version emits no per-level scores."""
    lc = model_cfg['LOSS_CONFIG']
    lw = lc['LOSS_WEIGHTS']
    tgt = point_head_vote_targets(out, gt_boxes, gt_mask, coder, model_cfg,
                                  num_class)
    vmask = out['vote_mask']
    fg = tgt['vote_fg'] & vmask
    labels = tgt['vote_cls_labels']

    # seed regression: vote → its seed's gt center (get_seed_single_reg_loss)
    sfg = tgt['seed_fg'] & vmask
    seed_l = weighted_smooth_l1(
        out['votes'], tgt['gt_box_of_fg_seeds'][..., :3],
        weights=sfg.astype(jnp.float32),
    ).sum(-1)
    seed_loss = seed_l.sum() / jnp.clip(sfg.sum(), 1.0) * float(
        lw['seed_reg_weight_list'][0]
    )

    # vote classification: BCE with centerness-scaled one-hot targets
    pos = (labels > 0) & vmask
    neg = (labels == 0) & vmask
    cls_w = (pos | neg).astype(jnp.float32)
    norm = pos.sum() if lc.get('CLS_POS_NORM', True) else cls_w.sum()
    cls_w = cls_w / jnp.clip(norm, 1.0)
    one_hot = jax.nn.one_hot(
        jnp.clip(labels, 0), num_class + 1
    )[..., 1:]
    if 'WithCenterness' in lc.get('CLS_LOSS', ''):
        centerness = generate_centerness_mask(
            jax.lax.stop_gradient(out['votes']), tgt['gt_box_of_fg_votes']
        )
        one_hot = one_hot * jnp.where(pos, centerness, 0.0)[..., None]
    logits = out['vote_cls_preds']
    bce = jnp.clip(logits, 0) - logits * one_hot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    cls_loss = (bce.mean(-1) * cls_w).sum() * float(lw['vote_cls_weight'])

    # vote regression: xyz+lwh smooth-L1, heading bin CE, bin residual
    reg_w = fg.astype(jnp.float32) / jnp.clip(fg.sum(), 1.0)
    preds, labs = out['vote_box_preds'], tgt['vote_box_labels']
    n = coder.angle_bin_num
    loss_xyzlwh = weighted_smooth_l1(
        preds[..., :6], labs[..., :6], weights=reg_w
    ).sum()
    dir_logits = preds[..., 6:6 + n]
    dir_onehot = labs[..., 6:6 + n]
    dir_ce = -(jax.nn.log_softmax(dir_logits) * dir_onehot).sum(-1)
    loss_dir_cls = (dir_ce * reg_w).sum()
    res_pred = (preds[..., 6 + n:6 + 2 * n] * dir_onehot).sum(-1)
    res_lab = (labs[..., 6 + n:6 + 2 * n] * dir_onehot).sum(-1)
    loss_dir_res = weighted_smooth_l1(
        res_pred[..., None], res_lab[..., None], weights=reg_w
    ).sum()
    reg_loss = (loss_xyzlwh + loss_dir_cls + loss_dir_res) * float(
        lw['vote_reg_weight']
    )

    # corner loss between decoded boxes and the containing gt boxes
    decoded = coder.decode(
        preds, out['votes'],
        tgt['gt_box_of_fg_votes'][..., 7].astype(jnp.int32),
    )
    pc = boxes_to_corners_3d(decoded[..., :7])
    gc = boxes_to_corners_3d(tgt['gt_box_of_fg_votes'][..., :7])
    corner = jnp.abs(pc - gc).sum(-1).mean(-1)  # L1 corner distance
    corner_loss = (corner * fg).sum() / jnp.clip(fg.sum(), 1.0) * float(
        lw['vote_corner_weight']
    )

    total = seed_loss + cls_loss + reg_loss + corner_loss
    return total, {
        'seed_reg_loss': seed_loss,
        'vote_cls_loss': cls_loss,
        'vote_reg_loss': reg_loss,
        'vote_corner_loss': corner_loss,
    }


def point_head_vote_predict(out, coder):
    """Decode vote predictions into (scores [B, K, num_class] sigmoid,
    boxes [B, K, 7]) — generate_predicted_boxes, point_head_template.py."""
    cls = jax.nn.sigmoid(out['vote_cls_preds'])
    pred_classes = jnp.argmax(out['vote_cls_preds'], axis=-1) + 1
    boxes = coder.decode(out['vote_box_preds'], out['votes'], pred_classes)
    masked = out['vote_mask'][..., None]
    return jnp.where(masked, cls, 0.0), boxes
