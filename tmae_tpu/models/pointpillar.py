"""PointPillar detector shell (reference ``detectors/pointpillar.py`` with the
PillarVFE → PointPillarScatter → BaseBEVBackbone → AnchorHeadSingle stack).

Consumes host-voxelized inputs (``transform_points_to_voxels`` processor):
  voxels [B, V, T, C], voxel_num_points [B, V], voxel_coords [B, V, 2] (y, x),
  voxel_mask [B, V].
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.voxelize import VoxelSpec, scatter_to_grid
from .anchor_head import AnchorHeadSingle
from .bev import BaseBEVBackbone
from .vfe import PillarVFE


class PointPillar(nn.Module):
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
    def __call__(self, batch, train: bool):
        vfe_cfg = self.model_cfg['VFE']
        pillar_feat = PillarVFE(
            self.spec,
            num_filters=list(vfe_cfg.get('NUM_FILTERS', [64])),
            use_absolute_xyz=vfe_cfg.get('USE_ABSLOTE_XYZ', True),
            with_distance=vfe_cfg.get('WITH_DISTANCE', False),
            name='vfe',
        )(batch['voxels'], batch['voxel_num_points'], batch['voxel_coords'],
          train)
        nx, ny, _ = self.spec.grid_size
        # PointPillarScatter (map_to_bev/pointpillar_scatter.py)
        bev = scatter_to_grid(
            pillar_feat, batch['voxel_coords'], batch['voxel_mask'], (ny, nx)
        )
        spatial2d = BaseBEVBackbone(
            self.model_cfg['BACKBONE_2D'], name='backbone_2d'
        )(bev, train)
        head = AnchorHeadSingle(
            self.model_cfg['DENSE_HEAD'], len(self.class_names),
            tuple(self.class_names), (nx, ny), self.spec.pc_range,
            name='dense_head',
        )
        out = head(spatial2d, train)
        return {'anchor_outputs': out, 'spatial_features_2d': spatial2d}
