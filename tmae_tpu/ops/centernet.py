"""CenterNet heatmap targets and box decoding, fully vectorized on device.

Replaces the reference's per-sample, per-GT host loop target assignment
(``pcdet/models/dense_heads/center_head.py:108-232``) and
``centernet_utils.gaussian_radius/draw_gaussian_to_heatmap/_topk/
decode_bbox_from_heatmap`` (``pcdet/models/model_utils/centernet_utils.py``) with a
fixed-patch scatter-max gaussian splat and static top-K decode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Fixed gaussian patch half-size. gaussian_radius for ONCE classes at 0.32 m cells
# stays well under this; radii are clamped (radius > _RMAX only flattens the very
# tail of the gaussian outside the patch, value < exp(-4.5) ≈ 0.011).
_RMAX = 24


def gaussian_radius(height, width, min_overlap=0.5):
    """Per centernet_utils.py:9-35 (min of three quadratic roots)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2
    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2
    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))
    # NB: (b3 + sq3) / 2, not / (2*a3) — reproduces the well-known CenterNet radius
    # quirk kept by the reference (centernet_utils.py:29-33) for target parity.
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


@partial(jax.jit, static_argnames=('num_classes', 'feature_map_size',
                                   'feature_map_stride'))
def assign_center_targets(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                          num_classes: int, feature_map_size: tuple,
                          point_cloud_range, voxel_size,
                          feature_map_stride: int = 1,
                          gaussian_overlap: float = 0.1, min_radius: int = 2):
    """gt_boxes [B, M, 8] (x,y,z,dx,dy,dz,heading,class 1-indexed), gt_mask [B, M].

    Returns dict:
      heatmap [B, num_classes, H, W], target_boxes [B, M, 8], inds [B, M],
      mask [B, M] — semantics of ``assign_target_of_single_head``
      (center_head.py:108-165), batched and loop-free.
    """
    W, H = feature_map_size  # reference passes (x, y)
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    B, M, _ = gt_boxes.shape

    x, y, z = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
    coord_x = jnp.clip((x - pc[0]) / vs[0] / feature_map_stride, 0, W - 0.5)
    coord_y = jnp.clip((y - pc[1]) / vs[1] / feature_map_stride, 0, H - 0.5)
    cx_int = coord_x.astype(jnp.int32)
    cy_int = coord_y.astype(jnp.int32)

    dx = gt_boxes[..., 3] / vs[0] / feature_map_stride
    dy = gt_boxes[..., 4] / vs[1] / feature_map_stride
    radius = gaussian_radius(dx, dy, min_overlap=gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    valid = gt_mask & (dx > 0) & (dy > 0)
    cls_id = jnp.clip(gt_boxes[..., 7].astype(jnp.int32) - 1, 0, num_classes - 1)

    # --- gaussian splat on fixed patches ---
    P = 2 * _RMAX + 1
    off = jnp.arange(-_RMAX, _RMAX + 1)
    oy = off[:, None]
    ox = off[None, :]
    # sigma = diameter/6 per gaussian2D (centernet_utils.py:38-44)
    sigma = (2 * radius.astype(jnp.float32) + 1) / 6.0
    g = jnp.exp(
        -(ox[None, None] ** 2 + oy[None, None] ** 2)
        / (2 * sigma[..., None, None] ** 2)
    )  # [B, M, P, P]
    inside = (jnp.abs(ox)[None, None] <= radius[..., None, None]) & (
        jnp.abs(oy)[None, None] <= radius[..., None, None]
    )
    g = jnp.where(inside & valid[..., None, None], g, 0.0)
    gy = cy_int[..., None, None] + oy[None, None]
    gx = cx_int[..., None, None] + ox[None, None]
    in_map = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    flat_idx = jnp.where(
        in_map & valid[..., None, None],
        cls_id[..., None, None] * (H * W) + gy * W + gx,
        num_classes * H * W,
    )

    def splat(one_idx, one_g):
        buf = jnp.zeros((num_classes * H * W + 1,), jnp.float32)
        buf = buf.at[one_idx.reshape(-1)].max(one_g.reshape(-1), mode='drop')
        return buf[:-1].reshape(num_classes, H, W)

    heatmap = jax.vmap(splat)(flat_idx, g)

    # --- regression targets at center cells ---
    code = gt_boxes.shape[-1] - 1 + 1  # 8 for 7-dof boxes
    tb = jnp.zeros((B, M, code), jnp.float32)
    tb = tb.at[..., 0].set(coord_x - cx_int)
    tb = tb.at[..., 1].set(coord_y - cy_int)
    tb = tb.at[..., 2].set(z)
    tb = tb.at[..., 3:6].set(jnp.log(jnp.clip(gt_boxes[..., 3:6], 1e-6)))
    tb = tb.at[..., 6].set(jnp.cos(gt_boxes[..., 6]))
    tb = tb.at[..., 7].set(jnp.sin(gt_boxes[..., 6]))
    if gt_boxes.shape[-1] > 8:
        tb = tb.at[..., 8:].set(gt_boxes[..., 7:-1])
    tb = jnp.where(valid[..., None], tb, 0.0)
    inds = jnp.where(valid, cy_int * W + cx_int, 0)
    return {
        'heatmap': heatmap,
        'target_boxes': tb,
        'inds': inds,
        'mask': valid,
        # raw gt boxes per slot — the IoU-head regression target
        # (center_head.py:160-165 ``iou_boxes``)
        'iou_boxes': jnp.where(valid[..., None], gt_boxes[..., :7], 0.0),
    }


def topk_heatmap(scores: jnp.ndarray, K: int, exact: bool = True):
    """[B, C, H, W] → (score, class, flat_ind, ys, xs) each [B, K], matching
    ``_topk`` (centernet_utils.py:136-151): top-K per class, then top-K overall.

    ``exact=False`` uses the TPU-native ``approx_max_k`` for the big per-class
    pass (recall_target=0.99; the exact ``lax.top_k`` over C x H*W lowers to a
    full sort, ~2 ms at the ONCE grid). Candidates far below the top-500
    cutoff are below any usable SCORE_THRESH, so AP is unaffected."""
    B, C, H, W = scores.shape
    if exact:
        s_cls, i_cls = jax.lax.top_k(scores.reshape(B, C, H * W), K)
    else:
        s_cls, i_cls = jax.lax.approx_max_k(
            scores.reshape(B, C, H * W), K, recall_target=0.99)
    s_all, i_all = jax.lax.top_k(s_cls.reshape(B, C * K), K)  # [B, K]
    cls = (i_all // K).astype(jnp.int32)
    flat = jnp.take_along_axis(i_cls.reshape(B, C * K), i_all, axis=1)
    ys = (flat // W).astype(jnp.float32)
    xs = (flat % W).astype(jnp.float32)
    return s_all, cls, flat, ys, xs


def gather_feat(feat: jnp.ndarray, inds: jnp.ndarray):
    """feat [B, C, H, W], inds [B, K] flat spatial → [B, K, C]."""
    B, C, H, W = feat.shape
    flat = feat.reshape(B, C, H * W)
    return jnp.take_along_axis(
        flat, inds[:, None, :].astype(jnp.int32), axis=2
    ).transpose(0, 2, 1)


def gather_feat_nhwc(feat: jnp.ndarray, inds: jnp.ndarray):
    """feat [B, H, W, C], inds [B, K] flat spatial → [B, K, C] — transpose-free
    row gather (C is contiguous per cell in NHWC)."""
    B, H, W, C = feat.shape
    flat = feat.reshape(B, H * W, C)
    return jnp.take_along_axis(
        flat, inds[..., None].astype(jnp.int32), axis=1)


def exact_topk_flat(flat: jnp.ndarray, K: int, block: int = 2048,
                    m: int = 64):
    """EXACT top-K over a large flat axis at ~blocked-sort cost.

    ``lax.top_k`` over the ONCE decode's H*W*C ≈ 1.1M logits lowers to a full
    sort (2.04 ms measured); this runs a per-block partial top-``m`` (sorting
    ``block`` lanes per row instead of N), a cheap top-K over the nb*m
    candidate union, then VERIFIES exactness on device: the union misses a
    global top-K element only if some block holds > m elements above the
    union's K-th value. When that fires, a ``lax.cond`` falls back to the
    full sort, so the result is exact unconditionally. Measured 0.71 ms at
    the defaults vs 0.38 ms for approx_max_k(0.99) (tools/profile_decode.py).
    Tie-breaking at the K-th value boundary may pick different equal-valued
    candidates than lax.top_k.
    """
    B, N = flat.shape
    nb = (N + block - 1) // block
    if nb * block != N:
        flat_p = jnp.pad(flat, ((0, 0), (0, nb * block - N)),
                         constant_values=-jnp.inf)
    else:
        flat_p = flat
    blk = flat_p.reshape(B, nb, block)
    sv, si = jax.lax.top_k(blk, m)                      # [B, nb, m]
    cs, ci = jax.lax.top_k(sv.reshape(B, nb * m), K)    # [B, K]
    tau = cs[:, -1]
    over = jnp.sum(blk > tau[:, None, None], axis=-1)   # [B, nb]
    ok = jnp.all(over <= m)
    bid = ci // m
    pos = jnp.take_along_axis(si.reshape(B, nb * m), ci, axis=1)
    idx = bid * block + pos
    return jax.lax.cond(
        ok,
        lambda _: (cs, idx.astype(jnp.int32)),
        lambda _: tuple(
            a.astype(d) for a, d in zip(jax.lax.top_k(flat, K),
                                        (cs.dtype, jnp.int32))),
        None,
    )


@partial(jax.jit, static_argnames=('K', 'feature_map_stride', 'exact_topk'))
def decode_bbox_from_heatmap(heatmap, rot_cos, rot_sin, center, center_z, dim,
                             point_cloud_range, voxel_size, feature_map_stride: int,
                             K: int, score_thresh: float,
                             post_center_limit_range, exact_topk: bool = True):
    """Static-shape version of centernet_utils.decode_bbox_from_heatmap:154-220.
    Returns boxes [B, K, 7], scores [B, K], labels [B, K] (0-indexed per head),
    valid [B, K]."""
    pc = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    lim = jnp.asarray(post_center_limit_range, jnp.float32)

    scores, cls, inds, ys, xs = topk_heatmap(heatmap, K, exact=exact_topk)
    ctr = gather_feat(center, inds)  # [B, K, 2]
    rc = gather_feat(rot_cos, inds)[..., 0]
    rs = gather_feat(rot_sin, inds)[..., 0]
    cz = gather_feat(center_z, inds)[..., 0]
    dims = gather_feat(dim, inds)  # [B, K, 3]
    angle = jnp.arctan2(rs, rc)
    xs = (xs + ctr[..., 0]) * feature_map_stride * vs[0] + pc[0]
    ys = (ys + ctr[..., 1]) * feature_map_stride * vs[1] + pc[1]
    boxes = jnp.concatenate(
        [xs[..., None], ys[..., None], cz[..., None], dims, angle[..., None]],
        axis=-1,
    )
    ok = jnp.all(boxes[..., :3] >= lim[:3], axis=-1)
    ok &= jnp.all(boxes[..., :3] <= lim[3:6], axis=-1)
    ok &= scores > score_thresh
    return boxes, scores, cls, ok
