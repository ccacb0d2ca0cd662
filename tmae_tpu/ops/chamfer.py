"""Weighted bidirectional Chamfer distance.

Matches ``pytorch3d.loss.chamfer_distance`` as used by the MAE loss
(``pcdet/models/backbones_3d/SiamWCA_MAE.py:154-164``): squared L2, mean over points
in each direction, per-cloud weights, batch reduction = sum / sum(weights).
Pure XLA (the clouds are tiny: 16 pred x 64 gt per voxel).
"""

from __future__ import annotations

import jax.numpy as jnp


def chamfer_distance(pred: jnp.ndarray, gt: jnp.ndarray,
                     weights: jnp.ndarray | None = None,
                     gt_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """pred [N, P, 3], gt [N, G, 3], weights [N] → scalar.

    gt_mask [N, G] optionally marks valid gt points (the reference wrap-repeats real
    points to fill G via the ``group_inner_inds`` CUDA kernel; a mask changes the
    per-cloud mean weighting slightly, so the default mask=None with wrap-filled gt
    matches the reference exactly).
    """
    d2 = jnp.sum(
        (pred[:, :, None, :] - gt[:, None, :, :]) ** 2, axis=-1
    )  # [N, P, G]
    if gt_mask is not None:
        big = jnp.asarray(1e9, d2.dtype)
        d2 = jnp.where(gt_mask[:, None, :], d2, big)
        cham_x = jnp.mean(jnp.min(d2, axis=2), axis=1)  # pred → gt
        mins_y = jnp.min(d2, axis=1)  # [N, G]
        cnt = jnp.maximum(jnp.sum(gt_mask, axis=1), 1)
        cham_y = jnp.sum(jnp.where(gt_mask, mins_y, 0.0), axis=1) / cnt
    else:
        cham_x = jnp.mean(jnp.min(d2, axis=2), axis=1)
        cham_y = jnp.mean(jnp.min(d2, axis=1), axis=1)
    per_cloud = cham_x + cham_y  # [N]
    if weights is None:
        return jnp.mean(per_cloud)
    wsum = jnp.maximum(jnp.sum(weights), 1e-6)
    return jnp.sum(per_cloud * weights) / wsum
