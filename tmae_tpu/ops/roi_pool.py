"""RoI pooling ops: point-in-box tests, fixed-size point gathering per RoI, and
voxel-pooled RoI features.

Static-shape JAX replacements for the reference CUDA modules
``pcdet/ops/roiaware_pool3d`` (points_in_boxes_gpu + RoIAwarePool3d) and
``pcdet/ops/roipoint_pool3d`` (gather a fixed number of points per RoI box).
Host-side point-in-box lives in the C++ host-ops; these are the on-device
versions for jitted second-stage heads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def points_in_boxes(points_xyz: jnp.ndarray, boxes: jnp.ndarray,
                    box_mask: jnp.ndarray | None = None,
                    margin: float = 0.0) -> jnp.ndarray:
    """[B, P, 3] x [B, M, 7] → int32 [B, P]: index of the first containing box
    or -1 (reference ``points_in_boxes_gpu`` semantics)."""

    def one(pts, bxs, bm):
        d = pts[:, None, :2] - bxs[None, :, :2]
        c, s = jnp.cos(bxs[:, 6]), jnp.sin(bxs[:, 6])
        u = d[..., 0] * c[None] + d[..., 1] * s[None]
        v = -d[..., 0] * s[None] + d[..., 1] * c[None]
        inz = jnp.abs(pts[:, None, 2] - bxs[None, :, 2]) <= (
            bxs[None, :, 5] / 2 + margin
        )
        inside = (
            (jnp.abs(u) <= bxs[None, :, 3] / 2 + margin)
            & (jnp.abs(v) <= bxs[None, :, 4] / 2 + margin) & inz
        )
        if bm is not None:
            inside = inside & bm[None, :]
        first = jnp.argmax(inside, axis=1).astype(jnp.int32)
        return jnp.where(jnp.any(inside, axis=1), first, -1)

    bm = box_mask if box_mask is not None else jnp.ones(boxes.shape[:2], bool)
    return jax.vmap(one)(points_xyz, boxes, bm)


@partial(jax.jit, static_argnames=('num_sampled',))
def roipoint_pool3d(points: jnp.ndarray, point_mask: jnp.ndarray,
                    boxes: jnp.ndarray, box_mask: jnp.ndarray,
                    num_sampled: int):
    """Gather a fixed number of (canonical-frame) points per RoI box
    (reference ``roipoint_pool3d``): [B, P, 3+C] x [B, M, 7] →
    (pooled [B, M, K, 3+C] canonicalized xyz, empty_flag [B, M])."""
    B, P, C = points.shape
    M = boxes.shape[1]
    box_idx = points_in_boxes(points[..., :3], boxes, box_mask)
    box_idx = jnp.where(point_mask, box_idx, -1)

    def one(pts, bidx, bxs):
        # rank of each point within its box (list order), like gather_gt_points
        key = jnp.where(bidx >= 0, bidx, M)
        order = jnp.argsort(key)
        s = key[order]
        pos = jnp.arange(P, dtype=jnp.int32)
        newflag = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        starts = jax.lax.cummax(jnp.where(newflag, pos, -1))
        rank = jnp.zeros((P,), jnp.int32).at[order].set(pos - starts)
        dest = jnp.where((rank < num_sampled) & (key < M),
                         key * num_sampled + rank, M * num_sampled)
        buf = jnp.zeros((M * num_sampled + 1, C), pts.dtype).at[dest].set(
            pts, mode='drop')[:-1].reshape(M, num_sampled, C)
        cnt = jnp.zeros((M * num_sampled + 1,), jnp.int32).at[dest].add(
            1, mode='drop')[:-1].reshape(M, num_sampled).sum(-1)
        # wrap-repeat to fill
        n = jnp.clip(cnt, 1, num_sampled)
        slot = jnp.arange(num_sampled)[None, :] % n[:, None]
        buf = jnp.take_along_axis(buf, slot[..., None].astype(jnp.int32), axis=1)
        # canonicalize xyz into the box frame
        d = buf[..., :3] - bxs[:, None, :3]
        c_, s_ = jnp.cos(bxs[:, 6])[:, None], jnp.sin(bxs[:, 6])[:, None]
        u = d[..., 0] * c_ + d[..., 1] * s_
        v = -d[..., 0] * s_ + d[..., 1] * c_
        canon = jnp.concatenate(
            [u[..., None], v[..., None], d[..., 2:3], buf[..., 3:]], axis=-1
        )
        return jnp.where((cnt > 0)[:, None, None], canon, 0.0), cnt == 0

    pooled, empty = jax.vmap(one)(points, box_idx, boxes)
    return pooled, empty


@partial(jax.jit, static_argnames=('out_size', 'num_sampled'))
def roiaware_pool3d(points: jnp.ndarray, point_mask: jnp.ndarray,
                    point_features: jnp.ndarray, boxes: jnp.ndarray,
                    box_mask: jnp.ndarray, out_size: int = 6,
                    num_sampled: int = 128):
    """Voxel-grid max-pooled RoI features (reference ``RoIAwarePool3d``):
    each RoI is split into out_size³ sub-voxels in its canonical frame; the
    features of points in each sub-voxel are max-pooled.
    Returns [B, M, out_size, out_size, out_size, C]."""
    pooled_pts, empty = roipoint_pool3d(
        jnp.concatenate([points[..., :3], point_features], axis=-1),
        point_mask, boxes, box_mask, num_sampled,
    )
    B, M, K, _ = pooled_pts.shape
    C = point_features.shape[-1]
    xyz = pooled_pts[..., :3]
    feats = pooled_pts[..., 3:]
    G = out_size

    def one(x, f, bxs):
        # sub-voxel index per sampled point
        rel = (x / jnp.maximum(bxs[:, None, 3:6], 1e-4) + 0.5) * G
        cell = jnp.clip(rel.astype(jnp.int32), 0, G - 1)
        flat = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]  # [M, K]
        midx = jnp.arange(M)[:, None]
        buf = jnp.full((M, G ** 3 + 1, C), -jnp.inf, f.dtype)
        buf = buf.at[midx, flat].max(f, mode='drop')
        out = buf[:, :G ** 3]
        return jnp.where(jnp.isfinite(out), out, 0.0)

    out = jax.vmap(one)(xyz, feats, boxes)
    out = jnp.where((box_mask & ~empty)[..., None, None], out, 0.0)
    return out.reshape(B, M, G, G, G, C)


@partial(jax.jit, static_argnames=('num_dvs_points', 'num_fps_points'))
def roilocal_dfvs_pool3d(points: jnp.ndarray, point_mask: jnp.ndarray,
                         boxes: jnp.ndarray, box_mask: jnp.ndarray,
                         num_dvs_points: int = 256, num_fps_points: int = 64):
    """TPU equivalent of the reference ``patch_ops`` RoI-local DFVS pooling
    (``patch_ops_utils.RoILocalDFVSPool3dV2``): gather candidate points per
    (already enlarged) box, then farthest-point-sample a fixed subset in the
    box's canonical frame. The CUDA patch/hash machinery (patch query, dynamic
    voxel sampling) exists to avoid O(N·M) work on a GPU; on TPU the dense
    masked gather IS the fast path, so only the sampling semantics survive.

    Returns (pooled [B, M, num_fps_points, 3+C] canonical xyz + raw features,
    empty [B, M]).
    """
    from .pointnet2 import farthest_point_sample, gather_points

    pooled, empty = roipoint_pool3d(points, point_mask, boxes, box_mask,
                                    num_dvs_points)
    B, M, K, C = pooled.shape
    flat = pooled.reshape(B * M, K, C)
    # wrap-repeated duplicates have zero distance so FPS only revisits them
    # once the distinct points are exhausted — no explicit count needed
    ones = jnp.ones((B * M, K), bool)
    idx = farthest_point_sample(flat[..., :3], ones, num_fps_points)
    out = gather_points(flat, idx).reshape(B, M, num_fps_points, C)
    return jnp.where((box_mask & ~empty)[..., None, None], out, 0.0), empty
