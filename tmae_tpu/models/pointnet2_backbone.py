"""PointNet++ backbone (reference ``pcdet/models/backbones_3d/pointnet2_backbone
.py`` PointNet2MSG) and the simple point head (``dense_heads/point_head_simple
.py``), built on the static-shape primitives in ``ops/pointnet2.py``. These back
the point-based model family (SSD3D / VSA / GraphRCNN aux heads).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pointnet2 import (
    farthest_point_sample, gather_points, query_and_group, three_nn,
    three_interpolate,
)
from .layers import LinearBNReLU


class GroupedMSG(nn.Module):
    """Multi-scale grouping core (given centers): per-radius ball query +
    grouped MLP + max-pool, concatenated over scales."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale

    @nn.compact
    def __call__(self, xyz, mask, features, centers, center_mask, train: bool):
        outs = []
        for si, (radius, nsample, widths) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            grouped, gidx, cnt = query_and_group(
                radius, nsample, xyz, mask, centers, center_mask, features,
            )
            B, S, K, C = grouped.shape
            x = grouped.reshape(B, S * K, C)
            gmask = jnp.repeat(
                (cnt > 0) & center_mask, K, axis=1
            ).reshape(B, S * K)
            for wi, w in enumerate(widths):
                x = LinearBNReLU(w, name=f'scale{si}_mlp{wi}')(x, gmask, train)
            x = x.reshape(B, S, K, -1)
            x = jnp.max(jnp.where(gmask.reshape(B, S, K, 1), x, -jnp.inf),
                        axis=2)
            x = jnp.where(((cnt > 0) & center_mask)[..., None], x, 0.0)
            outs.append(x)
        return jnp.concatenate(outs, axis=-1)


class SetAbstractionMSG(nn.Module):
    """SA layer: FPS centers + GroupedMSG (reference PointnetSAModuleMSG)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool):
        """xyz [B, N, 3], features [B, N, C] or None → (new_xyz [B, S, 3],
        new_mask, new_features [B, S, sum(mlps[-1])])."""
        idx = farthest_point_sample(xyz, mask, self.npoint)
        new_xyz = gather_points(xyz, idx)
        new_mask = jnp.take_along_axis(mask, idx, axis=1)
        f = GroupedMSG(self.radii, self.nsamples, self.mlps, name='grouped')(
            xyz, mask, features, new_xyz, new_mask, train
        )
        return new_xyz, new_mask, f


class FeaturePropagation(nn.Module):
    """FP layer: 3-NN inverse-distance interpolation + MLP (reference
    PointnetFPModule)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_dst, mask_dst, xyz_src, mask_src, feat_dst,
                 feat_src, train: bool):
        dist, idx = three_nn(xyz_dst, xyz_src, mask_src)
        interp = three_interpolate(feat_src, idx, dist)
        x = (
            jnp.concatenate([interp, feat_dst], axis=-1)
            if feat_dst is not None else interp
        )
        for wi, w in enumerate(self.mlp):
            x = LinearBNReLU(w, name=f'mlp{wi}')(x, mask_dst, train)
        return jnp.where(mask_dst[..., None], x, 0.0)


class PointNet2Backbone(nn.Module):
    """MSG SA pyramid + FP decoding back to the full point set (reference
    PointNet2MSG, pointnet2_backbone.py). Config keys mirror the reference:
    SA_CONFIG.{NPOINTS, RADIUS, NSAMPLE, MLPS} and FP_MLPS."""

    model_cfg: Any

    @nn.compact
    def __call__(self, points_xyz, point_mask, point_features, train: bool):
        sa_cfg = self.model_cfg['SA_CONFIG']
        fp_mlps = self.model_cfg.get('FP_MLPS', [])
        xyz = [points_xyz]
        mask = [point_mask]
        feats = [point_features]
        for i, npoint in enumerate(sa_cfg['NPOINTS']):
            nx, nm, nf = SetAbstractionMSG(
                npoint=int(npoint),
                radii=list(sa_cfg['RADIUS'][i]),
                nsamples=list(sa_cfg['NSAMPLE'][i]),
                mlps=[list(m) for m in sa_cfg['MLPS'][i]],
                name=f'sa_{i}',
            )(xyz[-1], mask[-1], feats[-1], train)
            xyz.append(nx)
            mask.append(nm)
            feats.append(nf)
        # FP back down the pyramid
        for j, mlp in enumerate(reversed(fp_mlps)):
            lvl = len(xyz) - 2 - j
            feats[lvl] = FeaturePropagation(list(mlp), name=f'fp_{j}')(
                xyz[lvl], mask[lvl], xyz[lvl + 1], mask[lvl + 1],
                feats[lvl], feats[lvl + 1], train,
            )
        return {
            'point_features': feats[0] if fp_mlps else feats[-1],
            'point_coords': xyz[0] if fp_mlps else xyz[-1],
            'point_mask': mask[0] if fp_mlps else mask[-1],
            'sa_features': feats,
            'sa_xyz': xyz,
        }


class PointHeadSimple(nn.Module):
    """Per-point foreground classification head (reference
    point_head_simple.py): fc stack → class logits; targets = points inside
    (enlarged) gt boxes."""

    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, point_features, point_mask, train: bool):
        x = point_features
        for w in self.model_cfg.get('CLS_FC', [256, 256]):
            x = LinearBNReLU(w)(x, point_mask, train)
        logits = nn.Dense(self.num_class)(x)
        return logits


def point_head_targets(points_xyz, point_mask, gt_boxes, gt_mask,
                       extra_width=0.2):
    """Per-point class targets: index of the first containing gt box → its class
    (reference assign_stack_targets, point_head_template.py). Returns labels
    [B, N] (0 background)."""
    from ..ops.geometry import boxes_to_corners_bev  # noqa: F401 (doc link)

    def one(pts, pm, boxes, bm):
        d = pts[:, None, :2] - boxes[None, :, :2]
        c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
        u = d[..., 0] * c[None] + d[..., 1] * s[None]
        v = -d[..., 0] * s[None] + d[..., 1] * c[None]
        inz = jnp.abs(pts[:, None, 2] - boxes[None, :, 2]) <= (
            boxes[None, :, 5] / 2 + extra_width
        )
        inside = (
            (jnp.abs(u) <= boxes[None, :, 3] / 2 + extra_width)
            & (jnp.abs(v) <= boxes[None, :, 4] / 2 + extra_width)
            & inz & bm[None, :] & pm[:, None]
        )
        first = jnp.argmax(inside, axis=1)
        has = jnp.any(inside, axis=1)
        cls = boxes[first, 7].astype(jnp.int32)
        return jnp.where(has, cls, 0)

    return jax.vmap(one)(points_xyz, point_mask, gt_boxes, gt_mask)


class PointHeadBox(nn.Module):
    """Point-wise classification + box regression head (reference
    ``dense_heads/point_head_box.py``): cls FC stack + box FC stack with the
    PointResidualCoder. Targets: a point inside a gt box takes the box's class
    and its point-residual encoding."""

    model_cfg: Any
    num_class: int

    @nn.compact
    def __call__(self, point_features, point_mask, train: bool):
        xc = point_features
        for wi, w in enumerate(self.model_cfg.get('CLS_FC', [256, 256])):
            xc = LinearBNReLU(w, name=f'cls_fc{wi}')(xc, point_mask, train)
        cls_logits = nn.Dense(self.num_class, name='cls_out')(xc)
        xb = point_features
        for wi, w in enumerate(self.model_cfg.get('REG_FC', [256, 256])):
            xb = LinearBNReLU(w, name=f'reg_fc{wi}')(xb, point_mask, train)
        box_code = nn.Dense(
            int(self.model_cfg.get('BOX_CODER_CONFIG', {}).get('code_size', 8)),
            name='box_out',
        )(xb)
        return cls_logits, box_code


def point_head_box_loss(cls_logits, box_code, points_xyz, point_mask, gt_boxes,
                        gt_mask, coder, loss_weights=None):
    """Focal cls + smooth-L1 box residual loss over foreground points
    (point_head_template.get_cls_layer_loss/get_box_layer_loss)."""
    from .pointnet2_backbone import point_head_targets
    from ..ops.losses import weighted_smooth_l1

    labels = point_head_targets(points_xyz, point_mask, gt_boxes, gt_mask)
    num_class = cls_logits.shape[-1]
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0), num_class + 1)[..., 1:]
    pos = (labels > 0) & point_mask
    neg = (labels == 0) & point_mask
    cls_w = (pos | neg).astype(jnp.float32) / jnp.maximum(
        pos.sum(axis=1, keepdims=True), 1.0
    )
    # sigmoid focal (loss_utils.SigmoidFocalClassification)
    p = jax.nn.sigmoid(cls_logits)
    alpha_w = one_hot * 0.25 + (1 - one_hot) * 0.75
    pt = one_hot * (1 - p) + (1 - one_hot) * p
    bce = jnp.clip(cls_logits, 0) - cls_logits * one_hot + jnp.log1p(
        jnp.exp(-jnp.abs(cls_logits))
    )
    cls_loss = (alpha_w * pt ** 2 * bce * cls_w[..., None]).sum() / \
        cls_logits.shape[0]

    # box residuals at foreground points vs their first containing gt box
    def one(pts, pm, boxes, bm, lab):
        d = pts[:, None, :2] - boxes[None, :, :2]
        c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
        u = d[..., 0] * c[None] + d[..., 1] * s[None]
        v = -d[..., 0] * s[None] + d[..., 1] * c[None]
        inz = jnp.abs(pts[:, None, 2] - boxes[None, :, 2]) <= boxes[None, :, 5] / 2
        inside = ((jnp.abs(u) <= boxes[None, :, 3] / 2)
                  & (jnp.abs(v) <= boxes[None, :, 4] / 2) & inz & bm[None, :])
        first = jnp.argmax(inside, axis=1)
        return boxes[first]

    tgt_boxes = jax.vmap(one)(points_xyz, point_mask, gt_boxes, gt_mask, labels)
    enc = coder.encode(tgt_boxes[..., :7].astype(jnp.float32),
                       points_xyz, labels)
    reg = weighted_smooth_l1(box_code, enc[..., :box_code.shape[-1]],
                             weights=pos.astype(jnp.float32))
    box_loss = reg.sum() / jnp.maximum(pos.sum(), 1.0)
    lw = loss_weights or {'point_cls_weight': 1.0, 'point_box_weight': 1.0}
    total = (cls_loss * lw.get('point_cls_weight', 1.0)
             + box_loss * lw.get('point_box_weight', 1.0))
    return total, {'point_cls_loss': cls_loss, 'point_box_loss': box_loss}


class SetAbstractionFSMSG(nn.Module):
    """Fusion-sampling MSG SA layer (reference ``PointnetSAModuleFSMSG``,
    pointnet2_modules.py:212-297): centers come from a list of samplers
    (D-FPS on xyz or F-FPS on xyz+feature distance), each drawing from a static
    index range of the input order; grouping is optionally radius-dilated and an
    aggregation MLP fuses the scales. With ``new_xyz`` given, sampling is skipped
    (vote aggregation in PointHeadVote)."""

    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale
    npoint_list: Sequence[int] = ()
    sample_range_list: Sequence[Sequence[int]] = ()
    sample_method_list: Sequence[str] = ()
    dilated_radius_group: bool = False
    weight_gamma: float = 1.0
    aggregation_mlp: Sequence[int] = ()

    @nn.compact
    def __call__(self, xyz, mask, features, train: bool, new_xyz=None,
                 new_mask=None):
        from ..ops.pointnet2 import (
            calc_dist_matrix_for_sampling, farthest_point_sample_matrix,
        )

        if new_xyz is None:
            idx_list = []
            for (npoints, (r0, r1), method) in zip(
                self.npoint_list, self.sample_range_list,
                self.sample_method_list,
            ):
                r1 = xyz.shape[1] if r1 == -1 else int(r1)
                xyz_s, mask_s = xyz[:, r0:r1], mask[:, r0:r1]
                if method == 'd-fps':
                    idx = farthest_point_sample(xyz_s, mask_s, int(npoints))
                elif method == 'f-fps':
                    feat_s = (features[:, r0:r1]
                              if features is not None else None)
                    dm = calc_dist_matrix_for_sampling(
                        xyz_s, feat_s, self.weight_gamma
                    )
                    idx = farthest_point_sample_matrix(
                        dm, mask_s, int(npoints)
                    )
                else:
                    raise NotImplementedError(method)
                idx_list.append(idx + r0)
            idx = jnp.concatenate(idx_list, axis=-1)
            new_xyz = gather_points(xyz, idx)
            new_mask = jnp.take_along_axis(mask, idx, axis=1)

        outs = []
        former_radius = 0.0
        for si, (radius, nsample, widths) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            min_r = former_radius if self.dilated_radius_group else 0.0
            grouped, gidx, cnt = query_and_group(
                float(radius), int(nsample), xyz, mask, new_xyz, new_mask,
                features, min_radius=float(min_r),
            )
            former_radius = float(radius)
            B, S, K, C = grouped.shape
            x = grouped.reshape(B, S * K, C)
            gmask = jnp.repeat(
                (cnt > 0) & new_mask, K, axis=1
            ).reshape(B, S * K)
            for wi, w in enumerate(widths):
                x = LinearBNReLU(w, name=f'scale{si}_mlp{wi}')(x, gmask, train)
            x = x.reshape(B, S, K, -1)
            x = jnp.max(jnp.where(gmask.reshape(B, S, K, 1), x, -jnp.inf),
                        axis=2)
            x = jnp.where(((cnt > 0) & new_mask)[..., None], x, 0.0)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        for wi, w in enumerate(self.aggregation_mlp):
            x = LinearBNReLU(w, name=f'agg_mlp{wi}')(x, new_mask, train)
        return new_xyz, new_mask, x


class PointNet2SAMSG(nn.Module):
    """Fusion-sampling SA-only backbone for SSD3D (reference ``PointNet2SAMSG``,
    pointnet2_backbone.py:95-189): a stack of SetAbstractionFSMSG layers; the
    last level's points/features feed the vote head, earlier levels are exposed
    as auxiliary point sets. Config keys mirror the reference SA_CONFIG:
    NPOINTS / SAMPLE_RANGE / SAMPLE_METHOD / RADIUS / NSAMPLE / MLPS /
    AGGREGATION_MLPS (+ DILATED_RADIUS_GROUP, WEIGHT_GAMMA)."""

    model_cfg: Any

    @nn.compact
    def __call__(self, points_xyz, point_mask, point_features, train: bool):
        sa = self.model_cfg['SA_CONFIG']
        xyz, mask, feats = [points_xyz], [point_mask], [point_features]
        for i in range(len(sa['NPOINTS'])):
            nx, nm, nf = SetAbstractionFSMSG(
                radii=list(sa['RADIUS'][i]),
                nsamples=list(sa['NSAMPLE'][i]),
                mlps=[list(m) for m in sa['MLPS'][i]],
                npoint_list=[int(n) for n in sa['NPOINTS'][i]],
                sample_range_list=[list(r) for r in sa['SAMPLE_RANGE'][i]],
                sample_method_list=list(sa['SAMPLE_METHOD'][i]),
                dilated_radius_group=bool(
                    sa.get('DILATED_RADIUS_GROUP', False)
                ),
                weight_gamma=float(sa.get('WEIGHT_GAMMA', 1.0)),
                aggregation_mlp=list(sa['AGGREGATION_MLPS'][i])
                if sa.get('AGGREGATION_MLPS') else (),
                name=f'sa_{i}',
            )(xyz[-1], mask[-1], feats[-1], train)
            xyz.append(nx)
            mask.append(nm)
            feats.append(nf)
        # this reference version has no per-level confidence branch, so the
        # aux lists carry coordinates only (pointnet2_backbone.py:164-171
        # appends nothing when li_scores is None)
        return {
            'point_coords': xyz[-1],
            'point_mask': mask[-1],
            'point_features': feats[-1],
            'sa_xyz': xyz,
            'sa_mask': mask,
            'aux_points_list': [],
            'aux_cls_preds_list': [],
        }
