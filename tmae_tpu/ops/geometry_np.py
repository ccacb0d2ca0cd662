"""Host-side (numpy) rotated-box geometry: BEV/3D IoU and greedy rotated NMS.

Replaces the reference's CUDA/numba kernels on the host paths:
  * ``iou3d_nms_kernel.cu`` / ``iou3d_cpu.cpp`` (augmentor collision tests, eval IoU)
  * ``once_eval/iou_utils.py`` numba.cuda ``rotate_iou_gpu_eval`` (ONCE AP).

Algorithm (fixed-size, branch-free, also mirrored on device in ``geometry.py``):
intersection of two rotated rectangles = convex hull of (corners of A inside B) ∪
(corners of B inside A) ∪ (edge-edge crossings); area by angle-sorted shoelace.

Boxes are ``[x, y, z, dx, dy, dz, heading]`` (LiDAR frame, heading CCW around +z).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-8


def boxes_to_corners_bev(boxes: np.ndarray) -> np.ndarray:
    """[N, 7] → [N, 4, 2] CCW BEV corners."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy, ang = boxes[:, 3], boxes[:, 4], boxes[:, 6]
    tmpl = np.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]])
    local = tmpl[None] * np.stack([dx, dy], -1)[:, None, :]  # [N,4,2]
    c, s = np.cos(ang), np.sin(ang)
    rx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    ry = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    return np.stack([rx + x[:, None], ry + y[:, None]], -1)


def _corners_in_box(pts, boxes):
    """pts [..., K, 2] vs boxes [..., 5(x,y,dx,dy,ang)] → bool [..., K]."""
    d = pts - boxes[..., None, 0:2]
    c, s = np.cos(boxes[..., 6]), np.sin(boxes[..., 6])
    u = d[..., 0] * c[..., None] + d[..., 1] * s[..., None]
    v = -d[..., 0] * s[..., None] + d[..., 1] * c[..., None]
    return (np.abs(u) <= boxes[..., None, 3] / 2 + 1e-5) & (
        np.abs(v) <= boxes[..., None, 4] / 2 + 1e-5
    )


def _pairwise_intersection_area(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """[N, 7] x [M, 7] → BEV intersection area [N, M]."""
    N, M = len(boxes_a), len(boxes_b)
    if N == 0 or M == 0:
        return np.zeros((N, M))
    ca = boxes_to_corners_bev(boxes_a)  # [N,4,2]
    cb = boxes_to_corners_bev(boxes_b)  # [M,4,2]

    # broadcast to pair grid
    A = np.broadcast_to(boxes_a[:, None, :], (N, M, 7))
    B = np.broadcast_to(boxes_b[None, :, :], (N, M, 7))
    pa = np.broadcast_to(ca[:, None], (N, M, 4, 2))
    pb = np.broadcast_to(cb[None, :], (N, M, 4, 2))

    cand = np.zeros((N, M, 24, 2))
    valid = np.zeros((N, M, 24), bool)
    # corners of A in B, corners of B in A
    cand[:, :, 0:4] = pa
    valid[:, :, 0:4] = _corners_in_box(pa, B)
    cand[:, :, 4:8] = pb
    valid[:, :, 4:8] = _corners_in_box(pb, A)

    # edge-edge crossings: edges a_i→a_{i+1}, b_j→b_{j+1}
    a1 = pa
    a2 = np.roll(pa, -1, axis=2)
    b1 = pb
    b2 = np.roll(pb, -1, axis=2)
    r = a2 - a1  # [N,M,4,2]
    sv = b2 - b1
    qp = b1[:, :, None, :, :] - a1[:, :, :, None, :]  # [N,M,4,4,2]
    rxs = r[:, :, :, None, 0] * sv[:, :, None, :, 1] - r[:, :, :, None, 1] * sv[:, :, None, :, 0]
    qpxs = qp[..., 0] * sv[:, :, None, :, 1] - qp[..., 1] * sv[:, :, None, :, 0]
    qpxr = qp[..., 0] * r[:, :, :, None, 1] - qp[..., 1] * r[:, :, :, None, 0]
    nz = np.abs(rxs) > _EPS
    denom = np.where(nz, rxs, 1.0)
    t = qpxs / denom
    u = qpxr / denom
    ok = nz & (t >= -1e-6) & (t <= 1 + 1e-6) & (u >= -1e-6) & (u <= 1 + 1e-6)
    pt = a1[:, :, :, None, :] + t[..., None] * r[:, :, :, None, :]
    cand[:, :, 8:24] = pt.reshape(N, M, 16, 2)
    valid[:, :, 8:24] = ok.reshape(N, M, 16)

    nval = valid.sum(-1)  # [N,M]
    has = nval >= 3
    w = valid.astype(np.float64)
    centroid = (cand * w[..., None]).sum(2) / np.maximum(nval, 1)[..., None]
    rel = cand - centroid[:, :, None, :]
    ang = np.arctan2(rel[..., 1], rel[..., 0])
    ang = np.where(valid, ang, np.inf)
    order = np.argsort(ang, axis=-1)
    rel_sorted = np.take_along_axis(rel, order[..., None], axis=2)
    valid_sorted = np.take_along_axis(valid, order, axis=2)
    # replace invalid slots with the first (valid) point so they contribute zero
    first = rel_sorted[:, :, 0:1, :]
    rel_sorted = np.where(valid_sorted[..., None], rel_sorted, first)
    nxt = np.roll(rel_sorted, -1, axis=2)
    cross = rel_sorted[..., 0] * nxt[..., 1] - rel_sorted[..., 1] * nxt[..., 0]
    area = 0.5 * np.abs(cross.sum(-1))
    return np.where(has, area, 0.0)


def intersection_area_bev(boxes_a, boxes_b, chunk: int = 256) -> np.ndarray:
    """Pairwise BEV intersection area. Uses the native C++ host-ops library when
    available (tmae_tpu/csrc/host_ops.cpp), else the chunked vectorized numpy
    path (bounded peak memory)."""
    from ..utils import native
    out = native.intersection_area_bev(np.asarray(boxes_a, np.float64),
                                       np.asarray(boxes_b, np.float64))
    if out is not None:
        return out
    N = len(boxes_a)
    out = np.zeros((N, len(boxes_b)))
    for i in range(0, N, chunk):
        out[i:i + chunk] = _pairwise_intersection_area(boxes_a[i:i + chunk], boxes_b)
    return out


def boxes_iou_bev(boxes_a, boxes_b) -> np.ndarray:
    """Rotated BEV IoU [N, M] (reference ``iou_bev``, iou3d_nms_kernel.cu:227)."""
    inter = intersection_area_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / np.clip(area_a + area_b - inter, 1e-6, None)


def boxes_iou3d(boxes_a, boxes_b) -> np.ndarray:
    """3D IoU [N, M] (reference ``boxes_iou3d_gpu``, iou3d_nms_utils.py:47-81)."""
    inter_bev = intersection_area_bev(boxes_a, boxes_b)
    amax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    amin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    bmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    bmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    inter_h = np.clip(np.minimum(amax, bmax) - np.maximum(amin, bmin), 0, None)
    inter = inter_bev * inter_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / np.clip(vol_a + vol_b - inter, 1e-6, None)


def boxes_iou3d_with_heading(boxes_a, boxes_b) -> np.ndarray:
    """ONCE eval variant: IoU zeroed where |heading diff| > pi/2
    (``once_eval/evaluation.py:iou3d_kernel_with_heading``)."""
    iou = boxes_iou3d(boxes_a, boxes_b)
    diff = np.abs(boxes_a[:, 6][:, None] - boxes_b[None, :, 6])
    diff = np.where(diff >= np.pi, 2 * np.pi - diff, diff)
    iou[diff > np.pi / 2] = 0.0
    return iou


def nms_bev(boxes: np.ndarray, scores: np.ndarray, thresh: float,
            pre_maxsize: int | None = None, post_maxsize: int | None = None):
    """Greedy rotated-BEV NMS (reference ``nms_gpu``). Returns kept indices into the
    original arrays, highest score first."""
    order = np.argsort(-scores, kind='stable')
    if pre_maxsize is not None:
        order = order[:pre_maxsize]
    b = boxes[order]
    n = len(order)
    if n == 0:
        return np.zeros((0,), np.int64)
    iou = boxes_iou_bev(b, b)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    keep = np.asarray(keep, np.int64)
    if post_maxsize is not None:
        keep = keep[:post_maxsize]
    return keep


def circle_nms(centers_scores: np.ndarray, thresh: float,
               post_max_size: int | None = None):
    """Center-distance NMS (reference numba ``circle_nms``,
    centernet_utils.py:80-104): dets [N, 3] = (x, y, score); suppress boxes whose
    squared center distance to a kept higher-score box is <= thresh."""
    x, y, scores = (centers_scores[:, 0], centers_scores[:, 1],
                    centers_scores[:, 2])
    order = np.argsort(-scores, kind='stable')
    suppressed = np.zeros(len(order), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        d2 = (x[i] - x) ** 2 + (y[i] - y) ** 2
        suppressed |= d2 <= thresh
        suppressed[i] = True
    keep = np.asarray(keep, np.int64)
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return keep


def multi_class_agnostic_nms(box_scores: np.ndarray, box_ious: np.ndarray,
                             box_labels: np.ndarray, box_preds: np.ndarray,
                             iou_rectifier, nms_thresh, pre_maxsize=None,
                             post_maxsize=None):
    """IoU-rectified per-class NMS (reference ``model_nms_utils.
    multi_class_agnostic_nms``, model_nms_utils.py:28-46): rectified score =
    score^(1-r) * iou^r with per-class rectifier r, then per-class rotated NMS
    with per-class thresholds. ``box_labels`` are 0-indexed class ids.
    Returns (selected indices, rectified scores at those indices)."""
    rect = np.asarray(iou_rectifier, np.float64)
    r = rect[np.clip(box_labels, 0, rect.shape[0] - 1)]
    rect_scores = np.power(np.clip(box_scores, 1e-12, None), 1.0 - r) * \
        np.power(np.clip(box_ious, 1e-12, None), r)
    threshs = list(nms_thresh)
    pres = (list(pre_maxsize) if isinstance(pre_maxsize, (list, tuple))
            else [pre_maxsize] * len(threshs))
    posts = (list(post_maxsize) if isinstance(post_maxsize, (list, tuple))
             else [post_maxsize] * len(threshs))
    out = []
    for c, (th, pre, po) in enumerate(zip(threshs, pres, posts)):
        idx = np.nonzero(box_labels == c)[0]
        if idx.size == 0:
            continue
        keep = nms_bev(box_preds[idx, :7], rect_scores[idx], float(th),
                       pre_maxsize=pre, post_maxsize=po)
        out.append(idx[keep])
    if not out:
        sel = np.zeros(0, np.int64)
    else:
        sel = np.concatenate(out)
    return sel, rect_scores[sel]


def multi_classes_nms(cls_scores: np.ndarray, boxes: np.ndarray, labels=None,
                      thresh: float = 0.5, score_thresh: float | None = None,
                      pre_maxsize: int | None = None,
                      post_maxsize: int | None = None):
    """Per-class rotated NMS (reference ``model_nms_utils.multi_classes_nms``):
    cls_scores [N, num_cls] or per-box scores with ``labels``; returns
    (indices, labels, scores) concatenated over classes."""
    if labels is None:
        num_cls = cls_scores.shape[1]
        out_idx, out_lab, out_sc = [], [], []
        for c in range(num_cls):
            s = cls_scores[:, c]
            m = np.ones(len(s), bool) if score_thresh is None else s > score_thresh
            idx = np.nonzero(m)[0]
            if len(idx) == 0:
                continue
            keep = nms_bev(boxes[idx], s[idx], thresh, pre_maxsize, post_maxsize)
            out_idx.append(idx[keep])
            out_lab.append(np.full(len(keep), c, np.int64))
            out_sc.append(s[idx][keep])
        if not out_idx:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0))
        return (np.concatenate(out_idx), np.concatenate(out_lab),
                np.concatenate(out_sc))
    out_idx, out_lab, out_sc = [], [], []
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        s = cls_scores[idx]
        keep = nms_bev(boxes[idx], s, thresh, pre_maxsize, post_maxsize)
        out_idx.append(idx[keep])
        out_lab.append(np.full(len(keep), c, np.int64))
        out_sc.append(s[keep])
    return (np.concatenate(out_idx), np.concatenate(out_lab),
            np.concatenate(out_sc))
