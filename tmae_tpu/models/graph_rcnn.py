"""Graph R-CNN second stage + detector shell (reference
``pcdet/models/roi_heads/graphrcnn_head.py`` and
``detectors/graph_rcnn.py``).

The second stage pools a fixed number of points per RoI (the TPU equivalent of
the patch_ops DFVS pooling — see ops/roi_pool.roilocal_dfvs_pool3d), builds a
k-NN graph over them, runs a stack of edge convolutions with channel
calibration (AttnGNNLayer), and regresses per-RoI cls/box refinements. The
first stage here is the SECOND-style voxel pipeline + AnchorHeadSingle; image
fusion (IMG_CONFIG/DLA/DCN) is gated off — no camera pipeline in this build
(the DCN op itself lives in ops/dcn.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.box_coder import ResidualCoder
from ..ops.roi_pool import roilocal_dfvs_pool3d
from ..ops.voxelize import VoxelSpec
from .anchor_head import AnchorHeadSingle, anchor_head_predict
from .backbone3d_voxel import VoxelBackBone8x, height_compression
from .bev import BaseBEVBackbone
from .layers import LinearBNReLU, MaskedBatchNorm
from .point_head_vote import enlarge_box3d
from .roi_head import assign_roi_targets, decode_rcnn_boxes, proposal_layer
from .vfe import MeanVFE


def _knn_idx(x, k):
    """x [N, T, C] → neighbor indices [N, T, k] by smallest L2 (includes
    self, like the reference's topk on -distance)."""
    d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def _graph_feature(x, idx):
    """x [N, T, C], idx [N, T, k] → edge features [N, T, k, 2C]
    (get_graph_feature: concat(neighbor - center, center))."""
    nbr = jax.vmap(lambda xi, ii: xi[ii])(x, idx)  # [N, T, k, C]
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


class ShortcutLayer(nn.Module):
    """Residual MLP block over per-RoI vectors (graphrcnn_head.py:12-40)."""

    channels: int
    hidden: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool):
        det = not train
        x = x + nn.Dropout(self.dropout, deterministic=det)(x)
        x = MaskedBatchNorm(name='norm1')(x, mask, not train)
        h = nn.relu(nn.Dense(self.hidden, name='conv1')(x))
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        h = nn.Dense(self.channels, name='conv2')(h)
        x = x + nn.Dropout(self.dropout, deterministic=det)(h)
        return MaskedBatchNorm(name='norm2')(x, mask, not train)


class AttnGNNLayer(nn.Module):
    """Edge-conv stack with channel calibration over per-RoI point graphs
    (graphrcnn_head.py:42-127)."""

    model_cfg: Any

    @nn.compact
    def __call__(self, xyz, feats, roi_mask, train: bool):
        """xyz [B, M, K, 3], feats [B, M, K, C], roi_mask [B, M] →
        [B, M, OUT_DIM]."""
        cfg = self.model_cfg
        B, M, K, _ = xyz.shape
        x = jnp.concatenate([xyz, feats], axis=-1).reshape(B * M, K, -1)
        tok_mask = jnp.repeat(roi_mask.reshape(B * M), K).reshape(B * M, K)
        use_feats_dist = bool(cfg.get('USE_FEATS_DIS', False))
        idx = None if use_feats_dist else _knn_idx(
            xyz.reshape(B * M, K, 3), int(cfg['K'])
        )
        outs = []
        for li, width in enumerate(cfg['MLPS']):
            cur_idx = idx if idx is not None else _knn_idx(x, int(cfg['K']))
            e = _graph_feature(x, cur_idx)          # [N, K, k, 2C]
            e = LinearBNReLU(int(width), name=f'edge{li}')(
                e.reshape(B * M, K * int(cfg['K']), -1),
                jnp.repeat(tok_mask, int(cfg['K']), axis=1), train,
            ).reshape(B * M, K, int(cfg['K']), -1)
            x = jnp.max(e, axis=2)                  # [N, K, width]
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        # channel calibration: sigmoid(conv(bn(relu(conv)))) gate
        g = LinearBNReLU(int(cfg['CALIB_DIM']), name='calib0')(
            x, tok_mask, train
        )
        g = nn.Dense(x.shape[-1], name='calib1')(g)
        x = jax.nn.sigmoid(g) * x
        for wi, w in enumerate(cfg['EXP_MLPS']):
            x = LinearBNReLU(int(w), name=f'exp{wi}')(x, tok_mask, train)
        x = jnp.max(
            jnp.where(tok_mask[..., None], x, -jnp.inf), axis=1
        )
        x = jnp.where(roi_mask.reshape(B * M, 1), x, 0.0)
        x = x.reshape(B, M, -1)
        if cfg.get('USE_REDUCTION', True):
            x = LinearBNReLU(int(cfg['OUT_DIM']), name='reduction')(
                x, roi_mask, train
            )
        if cfg.get('USE_SHORT_CUT', True):
            x = ShortcutLayer(int(cfg['OUT_DIM']), int(cfg['OUT_DIM']),
                              name='shortcut')(x, roi_mask, train)
        return x


class GraphRCNNHead(nn.Module):
    """DFVS pooling + AttnGNN + cls/reg (graphrcnn_head.py:129-302)."""

    model_cfg: Any
    num_class: int = 1

    @nn.compact
    def __call__(self, points, point_mask, rois, roi_mask, train: bool,
                 image_inputs=None):
        dfvs = self.model_cfg['DFVS_CONFIG']
        pooled, empty = roilocal_dfvs_pool3d(
            points, point_mask,
            enlarge_box3d(rois[..., :7],
                          [float(dfvs.get('POOL_EXTRA_WIDTH', 1.0))] * 3),
            roi_mask,
            num_dvs_points=int(dfvs.get('NUM_DVS_POINTS', 256)),
            num_fps_points=int(dfvs.get('NUM_FPS_POINTS', 64)),
        )
        if image_inputs is not None and self.model_cfg.get('IMG_CONFIG'):
            # per-point image features sampled at the pooled points' world
            # positions (graphrcnn_head.py:252-258 PointSample branch)
            from .point_sample import point_sample

            img_cfg = self.model_cfg['IMG_CONFIG']
            feats2d = image_inputs['image_features']
            for ci, w in enumerate(img_cfg.get('MLPS', [])):
                feats2d = nn.relu(nn.Conv(
                    int(w), (1, 1), use_bias=False, name=f'img_conv{ci}',
                )(feats2d))
            # reconstruct world xyz from the canonical pooled coordinates
            c_, s_ = (jnp.cos(rois[..., 6])[..., None],
                      jnp.sin(rois[..., 6])[..., None])
            cx = pooled[..., 0] * c_ - pooled[..., 1] * s_
            cy = pooled[..., 0] * s_ + pooled[..., 1] * c_
            world = jnp.stack([cx, cy, pooled[..., 2]], -1) + \
                rois[..., None, :3]
            B_, M_, K_, _ = world.shape
            img_feats, _ = point_sample(
                world.reshape(B_, M_ * K_, 3), feats2d,
                image_inputs['trans_lidar_to_cam'],
                image_inputs['trans_cam_to_img'],
                tuple(image_inputs['image_shape']),
                feat_stride=int(img_cfg.get('FEAT_STRIDE', 4)),
                aug_inverse=image_inputs.get('aug_inverse'),
            )
            pooled = jnp.concatenate(
                [pooled, img_feats.reshape(B_, M_, K_, -1)], axis=-1
            )
        # append the RoI's local corner extents to every pooled point
        # (graphrcnn_head.py:232-238)
        half = rois[..., 3:6] / 2
        corners = jnp.concatenate([-half, half], axis=-1)  # [B, M, 6]
        K = pooled.shape[2]
        pooled = jnp.concatenate(
            [pooled, jnp.broadcast_to(corners[:, :, None, :],
                                      (*pooled.shape[:3], 6))], axis=-1
        )
        pooled = jnp.where((roi_mask & ~empty)[..., None, None], pooled, 0.0)
        feats = AttnGNNLayer(self.model_cfg['ATTN_GNN_CONFIG'],
                             name='attn_gnn')(
            pooled[..., :3], pooled[..., 3:], roi_mask & ~empty, train,
        )
        x = LinearBNReLU(256, name='shared_fc')(feats, roi_mask, train)
        code_size = int(
            self.model_cfg['TARGET_CONFIG']
            .get('BOX_CODER_CONFIG', {}).get('code_size', 7)
        )
        rcnn_cls = nn.Dense(self.num_class, name='cls_out')(x)
        rcnn_reg = nn.Dense(
            code_size, name='reg_out',
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return rcnn_cls, rcnn_reg


class GraphRCNN(nn.Module):
    """Two-stage detector shell (detectors/graph_rcnn.py): SECOND-style first
    stage → proposals → GraphRCNNHead refinement."""

    model_cfg: Any
    class_names: Sequence[str]
    spec: VoxelSpec
    max_voxels_per_level: Sequence[int]
    occ_window_caps: Sequence[int] = ()  # unused (no SST windows); build parity
    occ_small_caps: Sequence[int] = ()  # unused; build parity
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] = ()
    occ_mid_tokens: int = 48
    vfe_compute: str = 'f32'

    @nn.compact
    def __call__(self, batch, train: bool, proposal_rng=None):
        feat = MeanVFE(name='vfe')(batch['voxels'], batch['voxel_num_points'])
        feat = jnp.where(batch['voxel_mask'][..., None], feat, 0.0)
        nx, ny, nz = self.spec.grid_size
        x, coords, mask, dhw, _ = VoxelBackBone8x(
            self.model_cfg.get('BACKBONE_3D', {}), (nz + 1, ny, nx),
            self.max_voxels_per_level, name='backbone_3d',
        )(feat, batch['voxel_coords_zyx'], batch['voxel_mask'], train)
        bev = height_compression(x, coords, mask, dhw)
        spatial2d = BaseBEVBackbone(
            self.model_cfg['BACKBONE_2D'], name='backbone_2d'
        )(bev, train)
        head = AnchorHeadSingle(
            self.model_cfg['DENSE_HEAD'], len(self.class_names),
            tuple(self.class_names), (nx, ny), self.spec.pc_range,
            name='dense_head',
        )
        anchor_out = head(spatial2d, train)

        # proposals (no gradient into the second stage through boxes)
        cls_preds, box_preds = anchor_head_predict(head, anchor_out)
        cls_preds = jax.lax.stop_gradient(jax.nn.sigmoid(cls_preds))
        box_preds = jax.lax.stop_gradient(box_preds)
        valid = jnp.ones(cls_preds.shape[:2], bool)
        roi_cfg = self.model_cfg['ROI_HEAD']
        nms_cfg = roi_cfg['NMS_CONFIG']['TRAIN' if train else 'TEST']
        rois, roi_scores, roi_labels, roi_mask = proposal_layer(
            cls_preds, box_preds, valid, nms_cfg,
            int(nms_cfg['NMS_POST_MAXSIZE']),
        )

        targets = None
        if train:
            if proposal_rng is None:
                proposal_rng = self.make_rng('proposal')
            targets = assign_roi_targets(
                proposal_rng, rois, roi_scores, roi_labels, roi_mask,
                batch['gt_boxes'], batch['gt_mask'],
                roi_cfg['TARGET_CONFIG'],
            )
            rois, roi_mask = targets['rois'], targets['roi_mask']

        image_inputs = None
        if 'images' in batch and self.model_cfg.get('IMG_BACKBONE'):
            from .dla import DLASeg

            img_feats = DLASeg(self.model_cfg['IMG_BACKBONE'],
                               name='img_backbone')(batch['images'], train)
            image_inputs = {
                'image_features': img_feats,
                'trans_lidar_to_cam': batch['trans_lidar_to_cam'],
                'trans_cam_to_img': batch['trans_cam_to_img'],
                'image_shape': batch['images'].shape[1:3],
                'aug_inverse': batch.get('aug_inverse'),
            }
        rcnn_cls, rcnn_reg = GraphRCNNHead(
            roi_cfg, num_class=1, name='roi_head',
        )(batch['points'], batch['point_mask'], rois, roi_mask, train,
          image_inputs=image_inputs)
        return {
            'anchor_outputs': anchor_out,
            'rois': rois,
            'roi_scores': roi_scores,
            'roi_labels': roi_labels,
            'roi_mask': roi_mask,
            'roi_targets': targets,
            'rcnn_cls': rcnn_cls,
            'rcnn_reg': rcnn_reg,
        }


def graph_rcnn_predict(cfg, outputs):
    """Final boxes: decode rcnn residuals against the RoIs; score =
    sqrt(sigmoid(rcnn_cls) * sigmoid(roi_score)) (graphrcnn_head.py:275-283)."""
    roi_cfg = cfg['MODEL']['ROI_HEAD']
    coder = ResidualCoder(
        code_size=int(roi_cfg['TARGET_CONFIG']
                      .get('BOX_CODER_CONFIG', {}).get('code_size', 7))
    )
    boxes = decode_rcnn_boxes(outputs['rcnn_reg'], outputs['rois'][..., :7],
                              coder)
    cls = jax.nn.sigmoid(outputs['rcnn_cls'][..., 0])
    # roi_scores are already probabilities (proposals run on sigmoid preds)
    scores = jnp.sqrt(jnp.clip(cls * outputs['roi_scores'], 0.0))
    return {
        'pred_boxes': boxes[..., :7],
        'pred_scores': jnp.where(outputs['roi_mask'], scores, 0.0),
        'pred_labels': outputs['roi_labels'],
        'pred_valid': outputs['roi_mask'],
    }


def graph_rcnn_loss(cfg, outputs, batch, bound_dense_head=None):
    """rpn (unless FREEZE_LAYERS) + rcnn loss (graph_rcnn.py:26-39).
    ``bound_dense_head``: the first-stage AnchorHeadSingle bound to its
    variables (needed for anchors/targets); omit when FREEZE_LAYERS is set."""
    from .anchor_head import anchor_head_loss
    from .roi_head import roi_head_loss

    model_cfg = cfg['MODEL']
    roi_cfg = model_cfg['ROI_HEAD']
    total, tb = 0.0, {}
    if model_cfg.get('FREEZE_LAYERS') is None and bound_dense_head is not None:
        rpn_targets = bound_dense_head.assign_targets(
            batch['gt_boxes'], batch['gt_mask']
        )
        rpn_loss, rpn_tb = anchor_head_loss(
            bound_dense_head, outputs['anchor_outputs'], rpn_targets,
            model_cfg['DENSE_HEAD']['LOSS_CONFIG'],
        )
        total = total + rpn_loss
        tb.update(rpn_tb)
    coder = ResidualCoder(
        code_size=int(roi_cfg['TARGET_CONFIG']
                      .get('BOX_CODER_CONFIG', {}).get('code_size', 7))
    )
    rcnn_loss, rcnn_tb = roi_head_loss(
        outputs['rcnn_cls'], outputs['rcnn_reg'], outputs['roi_targets'],
        coder, roi_cfg['LOSS_CONFIG'],
    )
    tb.update(rcnn_tb)
    return total + rcnn_loss, tb
