"""SSD3D (3DSSD-style single-stage point detector) shell.

Reference ``pcdet/models/detectors/ssd3d.py``: PointNet2SAMSG fusion-sampling
backbone straight from raw points → PointHeadVote; the training loss is the
head loss alone and prediction decodes the vote head's boxes. Batched
static-shape re-design — points stay [B, P, C] with masks end to end.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2_backbone import PointNet2SAMSG
from .point_head_vote import (
    PointHeadVote, point_head_vote_loss, point_head_vote_predict,
)
from ..ops.box_coder import PointBinResidualCoder


class SSD3D(nn.Module):
    """Point backbone + vote head (detectors/ssd3d.py:4-29)."""

    model_cfg: Any
    class_names: Sequence[str]
    spec: Any = None                       # unused: point-based, no voxel grid
    max_voxels_per_level: Sequence[int] = ()
    occ_window_caps: Sequence[int] = ()    # unused (no SST windows)
    occ_small_caps: Sequence[int] = ()  # unused; build parity
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] = ()
    occ_mid_tokens: int = 48
    vfe_compute: str = 'f32'

    @nn.compact
    def __call__(self, batch, train: bool):
        pts, mask = batch['points'], batch['point_mask']
        xyz = pts[..., :3]
        feats = pts[..., 3:] if pts.shape[-1] > 3 else None
        bb = PointNet2SAMSG(self.model_cfg['BACKBONE_3D'], name='backbone_3d')(
            xyz, mask, feats, train
        )
        head_out = PointHeadVote(
            self.model_cfg['POINT_HEAD'], len(self.class_names),
            name='point_head',
        )(bb['point_coords'], bb['point_mask'], bb['point_features'], train)
        return {'head_out': head_out, 'backbone_out': bb}


def ssd3d_coder(cfg):
    return PointBinResidualCoder(
        **dict(cfg['MODEL']['POINT_HEAD']['TARGET_CONFIG']['BOX_CODER_CONFIG'])
    )


def ssd3d_loss(cfg, outputs, batch):
    """loss = point_head.get_loss() (ssd3d.py:24-29)."""
    head_cfg = cfg['MODEL']['POINT_HEAD']
    total, tb = point_head_vote_loss(
        outputs['head_out'], batch['gt_boxes'], batch['gt_mask'],
        ssd3d_coder(cfg), head_cfg, len(cfg['CLASS_NAMES']),
    )
    return total, tb


def ssd3d_predict(cfg, outputs):
    """Decode (scores, boxes) per vote; NMS is applied by the shared host path
    (detectors.host_nms) like the other detectors."""
    scores, boxes = point_head_vote_predict(
        outputs['head_out'], ssd3d_coder(cfg)
    )
    labels = jnp.argmax(scores, axis=-1) + 1
    best = jnp.max(scores, axis=-1)
    return {
        'pred_boxes': boxes[..., :7],
        'pred_scores': best,
        'pred_labels': labels,
        'pred_valid': outputs['head_out']['vote_mask'],
    }
