"""PointNet++ primitives, static-shape JAX.

TPU re-implementations of the reference's CUDA extension modules
``pcdet/ops/pointnet2/pointnet2_batch`` and ``pointnet2_stack`` (ball query,
farthest point sampling, grouping, three-NN interpolation — pointnet2_api.cpp
exports) used by the point-based model family (SSD3D, VoxelSetAbstraction,
GraphRCNN). All functions take batched fixed-size arrays with validity masks and
return fixed-size results; nearest/FPS tie-breaking is deterministic.

Shapes: points ``[B, N, 3]``, features ``[B, N, C]``, masks ``[B, N]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 3] x [B, M, 3] → [B, N, M] squared L2."""
    return jnp.sum(
        (a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1
    )


@partial(jax.jit, static_argnames=('num_samples',))
def farthest_point_sample(points: jnp.ndarray, mask: jnp.ndarray,
                          num_samples: int) -> jnp.ndarray:
    """Iterative FPS (reference ``furthest_point_sampling_kernel``): [B, N, 3] →
    indices [B, S]. Starts at index 0 (like the CUDA kernel); invalid points are
    never selected (distance -inf)."""

    def one(pts, m):
        N = pts.shape[0]
        dist = jnp.where(m, _BIG, -_BIG)

        def body(i, state):
            dist, idxs, last = state
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(m, d, -_BIG))
            nxt = jnp.argmax(dist)
            idxs = idxs.at[i].set(nxt)
            return dist, idxs, nxt

        idxs0 = jnp.zeros((num_samples,), jnp.int32)
        first = jnp.argmax(m)  # first valid point
        idxs0 = idxs0.at[0].set(first)
        dist, idxs, _ = jax.lax.fori_loop(
            1, num_samples, body, (dist, idxs0, first)
        )
        return idxs

    return jax.vmap(one)(points, mask)


@partial(jax.jit, static_argnames=('num_samples',))
def farthest_point_sample_matrix(dist_matrix: jnp.ndarray, mask: jnp.ndarray,
                                 num_samples: int) -> jnp.ndarray:
    """FPS over a precomputed [B, N, N] distance matrix (reference
    ``furthest_point_sampling_matrix_kernel``) — used by F-FPS where the metric
    mixes geometry and feature distance."""

    def one(dm, m):
        dist = jnp.where(m, _BIG, -_BIG)

        def body(i, state):
            dist, idxs, last = state
            dist = jnp.minimum(dist, jnp.where(m, dm[last], -_BIG))
            nxt = jnp.argmax(dist)
            return dist, idxs.at[i].set(nxt), nxt

        first = jnp.argmax(m)
        idxs0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
        _, idxs, _ = jax.lax.fori_loop(
            1, num_samples, body, (dist, idxs0, first)
        )
        return idxs

    return jax.vmap(one)(dist_matrix, mask)


def calc_dist_matrix_for_sampling(xyz, features=None, gamma: float = 1.0):
    """Combined geometry + feature distance matrix for F-FPS (reference
    ``calc_dist_matrix_for_sampling``, pointnet2_utils.py)."""
    dist = square_distance(xyz, xyz)
    if features is not None:
        dist = dist + square_distance(features, features) * gamma
    return dist


@partial(jax.jit, static_argnames=('radius', 'nsample', 'min_radius'))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               xyz_mask: jnp.ndarray, centers: jnp.ndarray,
               center_mask: jnp.ndarray, min_radius: float = 0.0):
    """Reference ``ball_query_kernel``: for each center, up to ``nsample`` point
    indices within ``radius`` (first-found order, wrap-repeated to fill like the
    CUDA kernel). ``min_radius > 0`` gives the dilated variant
    (``ball_query_dilated_kernel``): min_radius < d <= radius.
    Returns (idx [B, M, nsample], cnt [B, M])."""
    d2 = square_distance(centers, xyz)  # [B, M, N]
    in_ball = (d2 <= radius * radius) & xyz_mask[:, None, :]
    if min_radius > 0.0:
        in_ball = in_ball & (d2 > min_radius * min_radius)
    # rank of each in-ball point among its center's hits (ascending index order)
    rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1) - 1
    cnt = jnp.sum(in_ball, axis=-1)
    B, M, N = d2.shape
    idx_src = jnp.arange(N, dtype=jnp.int32)[None, None, :]
    dest = jnp.where(in_ball & (rank < nsample), rank, nsample)
    buf = jnp.zeros((B, M, nsample + 1), jnp.int32)
    bidx = jnp.arange(B)[:, None, None]
    midx = jnp.arange(M)[None, :, None]
    buf = buf.at[bidx, midx, dest].set(
        jnp.broadcast_to(idx_src, dest.shape), mode='drop'
    )
    idx = buf[..., :nsample]
    # wrap-repeat the first found index into empty slots (CUDA kernel behavior)
    n = jnp.clip(cnt, 1, nsample)
    slot = jnp.arange(nsample)[None, None, :]
    idx = jnp.take_along_axis(idx, slot % n[..., None], axis=-1)
    idx = jnp.where(center_mask[..., None], idx, 0)
    return idx, cnt


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, N, C], idx [B, S] → [B, S, C] (reference gather_points)."""
    return jnp.take_along_axis(
        features, idx[..., None].astype(jnp.int32), axis=1
    )


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, N, C], idx [B, M, K] → [B, M, K, C] (reference
    group_points)."""
    B, M, K = idx.shape
    flat = idx.reshape(B, M * K)
    out = jnp.take_along_axis(
        features, flat[..., None].astype(jnp.int32), axis=1
    )
    return out.reshape(B, M, K, features.shape[-1])


@jax.jit
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             known_mask: jnp.ndarray):
    """Reference ``three_nn_kernel``: 3 nearest known points per unknown point.
    Returns (dist [B, N, 3], idx [B, N, 3])."""
    d2 = square_distance(unknown, known)
    d2 = jnp.where(known_mask[:, None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.clip(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      dist: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation (reference
    ``three_interpolate_kernel``): features [B, M, C], idx/dist [B, N, 3] →
    [B, N, C]."""
    w = 1.0 / jnp.clip(dist * dist, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neigh = group_points(features, idx)  # [B, N, 3, C]
    return jnp.sum(neigh * w[..., None], axis=2)


def query_and_group(radius: float, nsample: int, xyz, xyz_mask, centers,
                    center_mask, features=None, use_xyz=True,
                    min_radius: float = 0.0):
    """The reference ``QueryAndGroup`` module core (pointnet2_utils):
    ball query + grouping + center-relative coordinates. ``min_radius`` gives
    the dilated variant (``QueryAndGroupDilated``)."""
    idx, cnt = ball_query(radius, nsample, xyz, xyz_mask, centers, center_mask,
                          min_radius=min_radius)
    grouped_xyz = group_points(xyz, idx) - centers[:, :, None, :]
    if features is not None:
        grouped = group_points(features, idx)
        if use_xyz:
            grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
    else:
        grouped = grouped_xyz
    empty = (cnt == 0) | ~center_mask
    return jnp.where(empty[..., None, None], 0.0, grouped), idx, cnt
