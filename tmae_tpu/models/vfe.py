"""Voxel feature encoders.

``TemporalDynVFE`` is the T-MAE entry module (reference ``pcdet/models/backbones_3d/
vfe/temporal_dyn_vfe.py``): dynamic pillarization of two frames + PointNet-style
per-point MLP with max-pooling. Dynamic torch_scatter ops are replaced by static
segment reductions (DESIGN.md §1).

Also provides the reference's simpler encoders for capability parity: ``DynVFE``
(single frame), ``MeanVFE`` and ``PillarVFE`` (precomputed-voxel paths).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.voxelize import (
    VoxelSpec, voxelize, segment_mean, segment_max,
)
from .layers import LinearBNReLU


class DynPillarEncoder(nn.Module):
    """Single-frame dynamic pillar VFE core (reference ``DynVFE._forward``,
    temporal_dyn_vfe.py:55-125, 'mean' sampling + MLPs + scatter_max)."""

    spec: VoxelSpec
    mlps: Sequence[Sequence[int]]
    use_absolute_xyz: bool = True
    use_cluster_xyz: bool = True
    with_distance: bool = False
    # 'bf16' halves the bytes of the per-point MLP + the segment-max /
    # gather-back traffic (the VFE is bandwidth-bound at 131k points); f32
    # default keeps torch-parity exact
    compute_dtype: str = 'f32'

    @nn.compact
    def __call__(self, points, point_mask, train: bool, hostvox=None):
        """points [B, P, 4] (x, y, z, intensity) → dict with voxel features/coords/
        mask and the point→voxel map needed by the MAE target assigner.

        ``hostvox``: optional precomputed voxelization (ops.voxelize.
        voxelize_host, shipped by the input pipeline under
        RUNTIME.HOST_VOXELIZE) — skips the on-device voxelize pass."""
        spec = self.spec
        vox = hostvox if hostvox is not None else voxelize(
            points, point_mask, spec)
        V = spec.max_voxels
        pv = vox['point_voxel']
        pvalid = vox['point_valid']

        # 'mean' sample: per-voxel mean — precomputed by the host pipeline
        # when HOST_VOXELIZE_SORT ships it (saves a ~1.6 ms row-count-bound
        # scatter-add at P=131k), else one fused scatter-add on device
        if hostvox is not None and 'voxel_mean_xyz' in hostvox:
            sampled_xyz = hostvox['voxel_mean_xyz']
        else:
            x_mean = segment_mean(points, pv, V, valid=pvalid)  # [B, V, 4]
            sampled_xyz = x_mean[..., :3]

        # per-point features: [f_center, abs(x,y,z,i), f_cluster]
        vs = jnp.asarray(spec.voxel_size, points.dtype)
        rng = jnp.asarray(spec.pc_range, points.dtype)
        coords = vox['voxel_coords']  # [B, V, 2] (y, x)
        # voxel center of the point's own pillar
        safe_pv = jnp.minimum(pv, V - 1)
        own = jnp.take_along_axis(
            coords, safe_pv[..., None].astype(jnp.int32), axis=1
        )  # [B, P, 2]
        cx = (own[..., 1].astype(points.dtype) + 0.5) * vs[0] + rng[0]
        cy = (own[..., 0].astype(points.dtype) + 0.5) * vs[1] + rng[1]
        cz = jnp.full_like(cx, 0.5 * vs[2] + rng[2])
        f_center = jnp.stack(
            [points[..., 0] - cx, points[..., 1] - cy, points[..., 2] - cz], -1
        )
        feats = [f_center]
        if self.use_absolute_xyz:
            feats.append(points)
        else:
            feats.append(points[..., 3:])
        if self.use_cluster_xyz:
            mean_at_pt = jnp.take_along_axis(
                sampled_xyz, safe_pv[..., None].astype(jnp.int32), axis=1
            )
            feats.append(points[..., :3] - mean_at_pt)
        if self.with_distance:
            feats.append(
                jnp.linalg.norm(points[..., :3], axis=-1, keepdims=True)
            )
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(pvalid[..., None], x, 0.0)
        if self.compute_dtype == 'bf16':
            x = x.astype(jnp.bfloat16)

        # Host-sorted fast path (HOST_VOXELIZE_SORT): the row-count-bound
        # scatter-max becomes a Pallas segmented scan + end gather
        # (ops/sorted_segments.py). Invalid rows carry the OOB slot V, so
        # they form their own never-gathered segment — no -inf pre-mask.
        # Differentiable since round 5 (custom_vjp matching segment_max's
        # even tie-split), so TRAINING uses it too when the pipeline ships
        # sorted inputs; the scatter path remains for unsorted inputs.
        sorted_max = hostvox is not None and 'seg_ends' in hostvox
        n_stacks = len(self.mlps)
        for k, widths in enumerate(self.mlps):
            for w in widths:
                x = LinearBNReLU(w, name=f'mlp{k}_{w}')(x, pvalid, train)
            if sorted_max:
                from ..ops.sorted_segments import sorted_segment_max
                x_max = sorted_segment_max(
                    x, pv, hostvox['seg_ends'], vox['voxel_mask'], V)
            else:
                x_max = segment_max(
                    jnp.where(pvalid[..., None], x, -jnp.inf), pv, V
                )
            if k == n_stacks - 1:
                x = x_max
            else:
                back = jnp.take_along_axis(
                    x_max, safe_pv[..., None].astype(jnp.int32), axis=1
                )
                x = jnp.concatenate([x, back], axis=-1)

        voxel_feat = jnp.where(vox['voxel_mask'][..., None], x, 0.0)
        return {
            'voxel_features': voxel_feat,
            'voxel_coords': vox['voxel_coords'],
            'voxel_mask': vox['voxel_mask'],
            'point_voxel': pv,
            'point_valid': pvalid,
        }


class TemporalDynVFE(nn.Module):
    """Two-frame VFE: runs the shared pillar encoder on current and previous frame
    (reference ``TemporalDynVFE.forward``, temporal_dyn_vfe.py:127-162)."""

    spec: VoxelSpec
    mlps: Sequence[Sequence[int]]
    use_absolute_xyz: bool = True
    use_cluster_xyz: bool = True
    with_distance: bool = False
    compute_dtype: str = 'f32'
    # rematerialize the per-point MLP in the backward: its activations are
    # the largest train-time tensors (B x 131072 x (64+128) f32 per frame at
    # the production point cap) and the recompute is ~4 ms/frame
    remat: bool = True

    def setup(self):
        cls = (nn.remat(DynPillarEncoder, static_argnums=(3,))
               if self.remat else DynPillarEncoder)  # 3 = train (self is 0)
        self.encoder = cls(
            self.spec, self.mlps,
            use_absolute_xyz=self.use_absolute_xyz,
            use_cluster_xyz=self.use_cluster_xyz,
            with_distance=self.with_distance,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, points, point_mask, points_prev, point_mask_prev,
                 train: bool, prev_needed: bool = True,
                 hostvox_cur=None, hostvox_prv=None):
        if not prev_needed:
            # streaming serving: the prev pyramid comes from the cache, so
            # the prev-frame VFE is dead work — run cur only. Returns None
            # for the prev slot so any accidental consumer fails loudly
            # instead of silently reading aliased cur features.
            cur = self.encoder(points, point_mask, train, hostvox=hostvox_cur)
            return cur, None
        # NB: batching the two frames into one concatenated encoder pass was
        # measured SLOWER on TPU (10.4 ms vs 4.5 ms for the two sequential
        # calls at P=65536 — the segment/scatter ops scale superlinearly in
        # batch), so the frames run per-call. See tools/profile_stages.py.
        cur = self.encoder(points, point_mask, train, hostvox=hostvox_cur)
        prv = self.encoder(points_prev, point_mask_prev, train,
                           hostvox=hostvox_prv)
        return cur, prv

    @property
    def num_point_features(self):
        return self.mlps[-1][-1]


class DynVFE(nn.Module):
    """Single-frame dynamic VFE (reference ``vfe/dyn_vfe.py``)."""

    spec: VoxelSpec
    mlps: Sequence[Sequence[int]]
    use_absolute_xyz: bool = True
    use_cluster_xyz: bool = True
    with_distance: bool = False
    compute_dtype: str = 'f32'

    @nn.compact
    def __call__(self, points, point_mask, train: bool):
        return DynPillarEncoder(
            self.spec, self.mlps,
            use_absolute_xyz=self.use_absolute_xyz,
            use_cluster_xyz=self.use_cluster_xyz,
            with_distance=self.with_distance,
            compute_dtype=self.compute_dtype,
        )(points, point_mask, train)


class MeanVFE(nn.Module):
    """Mean of points per precomputed voxel (reference ``vfe/mean_vfe.py``):
    voxels [B, V, T, C] with per-voxel counts → [B, V, C]."""

    @nn.compact
    def __call__(self, voxels, voxel_num_points):
        total = jnp.sum(voxels, axis=2)
        cnt = jnp.clip(voxel_num_points[..., None].astype(voxels.dtype), 1.0)
        return total / cnt


class PillarVFE(nn.Module):
    """PointPillars encoder over precomputed voxels (reference
    ``vfe/pillar_vfe.py``): augment with cluster/center offsets, linear+BN+ReLU,
    max-pool over the points of each pillar."""

    spec: VoxelSpec
    num_filters: Sequence[int]
    use_absolute_xyz: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, voxel_num_points, voxel_coords, train: bool):
        """voxels [B, V, T, C(>=4)], voxel_num_points [B, V],
        voxel_coords [B, V, 2] (y, x)."""
        spec = self.spec
        B, V, T, C = voxels.shape
        cnt = jnp.clip(voxel_num_points[..., None, None].astype(voxels.dtype), 1.0)
        pmask = (
            jnp.arange(T)[None, None, :] < voxel_num_points[..., None]
        )  # [B, V, T]
        mean_xyz = jnp.sum(
            jnp.where(pmask[..., None], voxels[..., :3], 0.0), axis=2, keepdims=True
        ) / cnt
        f_cluster = voxels[..., :3] - mean_xyz
        vs = jnp.asarray(spec.voxel_size, voxels.dtype)
        rng = jnp.asarray(spec.pc_range, voxels.dtype)
        cx = (voxel_coords[..., 1:2].astype(voxels.dtype) + 0.5) * vs[0] + rng[0]
        cy = (voxel_coords[..., 0:1].astype(voxels.dtype) + 0.5) * vs[1] + rng[1]
        f_center = jnp.stack(
            [voxels[..., 0] - cx[..., None, :][..., 0],
             voxels[..., 1] - cy[..., None, :][..., 0],
             voxels[..., 2] - (0.5 * vs[2] + rng[2])], -1
        )
        feats = [voxels if self.use_absolute_xyz else voxels[..., 3:],
                 f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, -1)
        x = jnp.where(pmask[..., None], x, 0.0)
        flat_mask = pmask.reshape(B, V * T)
        for w in self.num_filters:
            x = LinearBNReLU(w)(x.reshape(B, V * T, -1), flat_mask, train)
            x = x.reshape(B, V, T, -1)
        x = jnp.where(pmask[..., None], x, -jnp.inf)
        out = jnp.max(x, axis=2)
        return jnp.where(voxel_num_points[..., None] > 0, out, 0.0)
