"""SECONDNet detector shell (reference ``pcdet/models/detectors/second_net.py``):
MeanVFE → VoxelBackBone8x → HeightCompression → BaseBEVBackbone →
AnchorHeadSingle. Consumes host-voxelized 3D inputs."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.voxelize import VoxelSpec
from .anchor_head import AnchorHeadSingle
from .backbone3d_voxel import VoxelBackBone8x, height_compression
from .bev import BaseBEVBackbone
from .vfe import MeanVFE


class SECONDNet(nn.Module):
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
        feat = MeanVFE(name='vfe')(batch['voxels'], batch['voxel_num_points'])
        feat = jnp.where(batch['voxel_mask'][..., None], feat, 0.0)
        nx, ny, nz = self.spec.grid_size
        # spconv convention: sparse z-shape = nz + 1 (trailing headroom)
        grid_dhw = (nz + 1, ny, nx)
        x, coords, mask, dhw, hidden = VoxelBackBone8x(
            self.model_cfg.get('BACKBONE_3D', {}), grid_dhw,
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
        out = head(spatial2d, train)
        return {'anchor_outputs': out, 'spatial_features_2d': spatial2d}
