"""Image-point fusion: project lidar points into the camera image and
bilinearly sample image features (reference
``pcdet/models/fusion_layers/point_sample.py`` + ``utils/transform_utils.py``).

Batched static-shape redesign: instead of replaying named augmentation lists
in reverse (transform_utils.random_flip_* etc.), the augmentor records one
composed 4x4 ``aug_matrix`` per sample; its inverse maps augmented lidar
points back to the sensor frame before projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dcn import _bilinear_sample


def points_lidar2img(points, proj_mat):
    """points [N, 3], proj [3|4, 4] → pixel coords [N, 2] (x, y)
    (transform_utils.points_lidar2img)."""
    hom = jnp.concatenate(
        [points, jnp.ones((*points.shape[:-1], 1), points.dtype)], axis=-1
    )
    cam = hom @ proj_mat[:3].T  # [N, 3]
    depth = jnp.clip(cam[..., 2:3], 1e-5)
    return cam[..., :2] / depth, cam[..., 2]


def img_grid_sample(img_feats, pts_2d):
    """img_feats [H, W, C], pts_2d [N, 2] pixel coords (x, y) in the ORIGINAL
    image resolution scaled by the caller to feature resolution →
    [N, C] bilinear samples, zero outside (grid_sample align_corners=True
    equivalent on direct pixel coordinates)."""
    return _bilinear_sample(img_feats, pts_2d[:, 1], pts_2d[:, 0])


class PointSample:
    """Functional fusion op (point_sample.py:27-80): for each sample, undo the
    3D world augmentation, project to the image plane, rescale to the feature
    stride, and sample."""

    def __call__(self, points, img_feats, trans_lidar_to_cam,
                 trans_cam_to_img, image_shape, feat_stride: int = 4,
                 aug_inverse=None):
        """points [B, N, 3]; img_feats [B, Hf, Wf, C];
        trans_* [B, 4, 4] / [B, 3, 4]; image_shape (H, W) of the raw image;
        aug_inverse [B, 4, 4] or None → features [B, N, C], valid [B, N]."""
        H, W = image_shape

        def one(pts, feats, l2c, c2i, inv):
            if inv is not None:
                hom = jnp.concatenate(
                    [pts, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=-1
                )
                pts = (hom @ inv.T)[:, :3]
            proj = c2i[:3] @ l2c
            uv, depth = points_lidar2img(pts, proj)
            in_img = (
                (uv[:, 0] >= 0) & (uv[:, 0] <= W - 1)
                & (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1) & (depth > 0)
            )
            sampled = img_grid_sample(feats, uv / feat_stride)
            return jnp.where(in_img[:, None], sampled, 0.0), in_img

        if aug_inverse is None:
            return jax.vmap(lambda p, f, a, b: one(p, f, a, b, None))(
                points, img_feats, trans_lidar_to_cam, trans_cam_to_img
            )
        return jax.vmap(one)(points, img_feats, trans_lidar_to_cam,
                             trans_cam_to_img, aug_inverse)


point_sample = PointSample()
