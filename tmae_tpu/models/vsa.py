"""VoxelSetAbstraction (reference ``pcdet/models/backbones_3d/pfe/
voxel_set_abstraction.py``): keypoint sampling (FPS) + multi-source feature
aggregation — raw points (SA grouping), multi-scale sparse-voxel features (SA over
voxel centers), and bilinear BEV features. The PV-RCNN-style point feature
extractor backing the two-stage / GraphRCNN path.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pointnet2 import farthest_point_sample, gather_points
from .pointnet2_backbone import GroupedMSG
from .layers import LinearBNReLU


def bilinear_interpolate(grid: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """grid [H, W, C]; x/y fractional pixel coords [N] → [N, C]
    (reference common_utils.bilinear_interpolate_torch)."""
    H, W, C = grid.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    Ia = grid[y0, x0]
    Ib = grid[y1, x0]
    Ic = grid[y0, x1]
    Id = grid[y1, x1]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None]
            + Id * wd[:, None])


class VoxelSetAbstraction(nn.Module):
    """Keypoints = FPS over raw points; features = concat of
    [BEV bilinear, raw-point SA, per-source voxel-center SA] → fused MLP.

    Config (reference schema): NUM_KEYPOINTS, FEATURES_SOURCE
    (['bev', 'raw_points', 'x_conv1', ...]), SA_LAYER per source
    {POOL_RADIUS, NSAMPLE, MLPS}, NUM_OUTPUT_FEATURES."""

    model_cfg: Any
    voxel_size: tuple
    pc_range: tuple

    @nn.compact
    def __call__(self, points, point_mask, train: bool, bev_features=None,
                 bev_stride: int = 1, voxel_sources=None):
        """points [B, P, 3+]; bev_features [B, H, W, C] (NHWC);
        voxel_sources: {name: (centers [B, V, 3], mask [B, V], feats [B, V, C])}.
        Returns (keypoints [B, K, 3], features [B, K, F], kp_mask)."""
        cfg = self.model_cfg
        K = int(cfg['NUM_KEYPOINTS'])
        xyz = points[..., :3]
        kp_idx = farthest_point_sample(xyz, point_mask, K)
        keypoints = gather_points(xyz, kp_idx)
        kp_mask = jnp.take_along_axis(point_mask, kp_idx, axis=1)

        feats = []
        for src in cfg['FEATURES_SOURCE']:
            if src == 'bev':
                vs = jnp.asarray(self.voxel_size)
                pc = jnp.asarray(self.pc_range)
                xs = (keypoints[..., 0] - pc[0]) / vs[0] / bev_stride
                ys = (keypoints[..., 1] - pc[1]) / vs[1] / bev_stride

                def one(g, xi, yi):
                    return bilinear_interpolate(g, xi, yi)

                feats.append(jax.vmap(one)(bev_features, xs, ys))
            elif src == 'raw_points':
                sa_cfg = cfg['SA_LAYER']['raw_points']
                f = GroupedMSG(
                    radii=list(sa_cfg['POOL_RADIUS']),
                    nsamples=list(sa_cfg['NSAMPLE']),
                    mlps=[list(m) for m in sa_cfg['MLPS']],
                    name='sa_raw_points',
                )(xyz, point_mask,
                  points[..., 3:] if points.shape[-1] > 3 else None,
                  keypoints, kp_mask, train)
                feats.append(f)
            else:
                centers, vmask, vfeats = voxel_sources[src]
                sa_cfg = cfg['SA_LAYER'][src]
                f = GroupedMSG(
                    radii=list(sa_cfg['POOL_RADIUS']),
                    nsamples=list(sa_cfg['NSAMPLE']),
                    mlps=[list(m) for m in sa_cfg['MLPS']],
                    name=f'sa_{src}',
                )(centers, vmask, vfeats, keypoints, kp_mask, train)
                feats.append(f)
        x = jnp.concatenate(feats, axis=-1)
        B, K_, _ = x.shape
        out = LinearBNReLU(
            int(cfg['NUM_OUTPUT_FEATURES']), name='vsa_out'
        )(x, kp_mask, train)
        return keypoints, jnp.where(kp_mask[..., None], out, 0.0), kp_mask
