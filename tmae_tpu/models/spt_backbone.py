"""Single-frame SST backbones (the GD-MAE family the reference inherits from).

``SPTBackbone``: reference ``pcdet/models/backbones_3d/spt_backbone.py:356-442`` —
stack of SSTBlocks + deblock fusion (no temporal branch).
``SPTBackboneMAE``: reference ``spt_backbone_mae.py`` — random voxel mask → SST
encode → dense decoder → per-voxel point prediction with Chamfer loss.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.voxelize import gather_from_grid
from .siamwca import (
    PyramidFuse, gather_gt_points, random_voxel_mask,
)
from .sst import DenseGrid, SSTBlock, VoxelSet


class SPTEncoder(nn.Module):
    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    window: int = 8
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    remat_stages: Sequence[bool] = ()
    occ_mid_tokens: int = 48

    def _max_tokens(self, blk) -> int:
        drop = blk['PREPROCESS']['DROP_INFO']['train']
        return max(int(v['max_tokens']) for v in dict(drop).values())

    @nn.compact
    def __call__(self, grid: DenseGrid, train: bool):
        hidden = []
        x = grid
        caps = self.occ_window_caps
        for i, b in enumerate(self.model_cfg['SST_BLOCK_LIST']):
            x = SSTBlock(
                encoder_cfg=dict(b['ENCODER']), window=self.window,
                max_tokens=self._max_tokens(b),
                max_voxels_out=self.max_voxels_per_level[i],
                occ_window_cap=int(caps[i]) if caps else 0,
                occ_small_cap=(int(self.occ_small_caps[i])
                               if self.occ_small_caps else 0),
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_cap=(int(self.occ_mid_caps[i])
                             if self.occ_mid_caps else 0),
                occ_mid_tokens=self.occ_mid_tokens,
                name=f'sst_block_{i}',
            )(x, train)
            hidden.append(x)
        return hidden


class SPTBackbone(nn.Module):
    """Single-frame pyramid encode + dense fusion → stride-1 spatial features."""

    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    remat_stages: Sequence[bool] = ()
    occ_mid_tokens: int = 48

    @nn.compact
    def __call__(self, vs: VoxelSet, train: bool):
        from .layers import CARRIER_DTYPE

        grid = DenseGrid(x=vs.to_dense().astype(CARRIER_DTYPE),
                         occ=vs.occupancy())
        hidden = SPTEncoder(
            self.model_cfg, self.max_voxels_per_level,
            occ_window_caps=self.occ_window_caps,
            occ_small_caps=self.occ_small_caps,
            occ_small_tokens=self.occ_small_tokens, name='encoder'
        )(grid, train)
        fuse_layers = [
            dict(self.model_cfg['FUSE_LAYER'][src])
            for src in self.model_cfg['FEATURES_SOURCE']
        ]
        spatial = PyramidFuse(fuse_layers, name='fuse')(
            [h.x for h in hidden], train
        )
        return spatial, hidden


class SPTBackboneMAE(nn.Module):
    """Single-frame MAE: mask → encode → decode → per-voxel point prediction
    (spt_backbone_mae.py:94-156)."""

    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    voxel_size: tuple
    pc_range: tuple
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    remat_stages: Sequence[bool] = ()
    occ_mid_tokens: int = 48

    @nn.compact
    def __call__(self, vs: VoxelSet, points_xyz, point_voxel, point_valid,
                 train: bool, mask_rng=None):
        mask_cfg = self.model_cfg['MASK_CONFIG']
        ratio = float(mask_cfg['RATIO'])
        n_pred = int(mask_cfg['NUM_PRD_POINTS'])
        n_gt = int(mask_cfg['NUM_GT_POINTS'])

        num_valid = jnp.sum(vs.mask, axis=1)
        if mask_rng is None:
            mask_rng = self.make_rng('mae_mask')
        mae_mask = random_voxel_mask(mask_rng, vs.mask, num_valid, ratio)
        visible = vs.mask & (mae_mask == 0.0)
        vs_vis = VoxelSet(
            feat=jnp.where(visible[..., None], vs.feat, 0.0),
            coords=vs.coords, mask=visible, grid_hw=vs.grid_hw,
        )
        from .layers import CARRIER_DTYPE

        g_vis = DenseGrid(x=vs_vis.to_dense().astype(CARRIER_DTYPE),
                          occ=vs_vis.occupancy())

        hidden = SPTEncoder(
            self.model_cfg, self.max_voxels_per_level,
            occ_window_caps=self.occ_window_caps,
            occ_small_caps=self.occ_small_caps,
            occ_small_tokens=self.occ_small_tokens, name='encoder'
        )(g_vis, train)
        fuse_layers = [
            dict(self.model_cfg['FUSE_LAYER'][src])
            for src in self.model_cfg['FEATURES_SOURCE']
        ]
        spatial = PyramidFuse(fuse_layers, name='decoder_fuse')(
            [h.x for h in hidden], train)

        V = vs.coords.shape[1]
        pyr = gather_from_grid(spatial, vs.coords, vs.mask)
        pred = nn.Dense(n_pred * 3, name='decoder_pred')(pyr)
        pred = pred.reshape(pred.shape[0], V, n_pred, 3)

        gt = gather_gt_points(points_xyz, point_voxel, point_valid, V, n_gt)
        vsz = jnp.asarray(self.voxel_size, jnp.float32)
        rng_ = jnp.asarray(self.pc_range, jnp.float32)
        cx = (vs.coords[..., 1].astype(jnp.float32) + 0.5) * vsz[0] + rng_[0]
        cy = (vs.coords[..., 0].astype(jnp.float32) + 0.5) * vsz[1] + rng_[1]
        cz = jnp.full_like(cx, 0.5 * vsz[2] + rng_[2])
        centers = jnp.stack([cx, cy, cz], axis=-1)
        norm_gt = gt - centers[:, :, None, :]

        return {
            'pred_points': pred,
            'gt_points': norm_gt,
            'loss_weights': mae_mask * vs.mask.astype(jnp.float32),
            'mae_mask': mae_mask,
            'spatial_features': spatial,
        }
