"""On-device (JAX/XLA) rotated-box geometry: BEV/3D IoU and fixed-shape greedy NMS.

Device counterpart of ``geometry_np.py`` (same candidate-point hull algorithm),
replacing the reference's CUDA ``iou3d_nms_kernel.cu`` on the jitted inference path.
All shapes are static; NMS runs a ``lax.fori_loop`` over a fixed box budget and
returns a keep mask instead of a ragged index list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def boxes_to_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] → [..., 4, 2] CCW BEV corners."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, ang = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    tmpl = jnp.array([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]],
                     boxes.dtype)
    local = tmpl * jnp.stack([dx, dy], -1)[..., None, :]
    c, s = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    rx = local[..., 0] * c - local[..., 1] * s
    ry = local[..., 0] * s + local[..., 1] * c
    return jnp.stack([rx + x[..., None], ry + y[..., None]], -1)


def _corners_in_box(pts, boxes):
    d = pts - boxes[..., None, 0:2]
    c, s = jnp.cos(boxes[..., 6])[..., None], jnp.sin(boxes[..., 6])[..., None]
    u = d[..., 0] * c + d[..., 1] * s
    v = -d[..., 0] * s + d[..., 1] * c
    return (jnp.abs(u) <= boxes[..., None, 3] / 2 + 1e-5) & (
        jnp.abs(v) <= boxes[..., None, 4] / 2 + 1e-5
    )


def _sh_intersection_area_flat(boxes_a: jnp.ndarray,
                               boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Sort-free Sutherland–Hodgman intersection area over flat pairs.

    boxes_a/boxes_b: [K, 7] (paired row-wise) → [K] areas. Clips rectangle A by
    the four half-planes of rectangle B with fixed 8-vertex buffers; compaction
    uses a one-hot matmul (VPU/MXU friendly), no sorts and no sequential loops —
    ~100x faster on TPU than the per-pair convex-hull-with-argsort formulation.
    """
    K = boxes_a.shape[0]
    S = 8  # max vertices of rect∩rect
    ca = boxes_to_corners_bev(boxes_a)  # [K, 4, 2]
    cb = boxes_to_corners_bev(boxes_b)

    poly = jnp.zeros((K, S, 2), boxes_a.dtype).at[:, :4].set(ca)
    nvert = jnp.full((K,), 4, jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1)

    for e in range(4):
        active = slot < nvert[:, None]  # [K, S]
        # Pad slots duplicate the FIRST vertex, so roll(-1) realizes the
        # cyclic "next vertex" for every active slot (the wrap at nvert-1
        # lands on a pad = vertex 0) with NO take_along_axis gathers —
        # per-row dynamic gathers scalarize on TPU and dominated this op
        # (~300 ms for 500x500 pairs).
        first = poly[:, :1]
        poly = jnp.where(active[..., None], poly, first)
        e0 = cb[:, e]  # [K, 2]
        e1 = cb[:, (e + 1) % 4]
        ex = e1 - e0
        d = ex[:, None, 0] * (poly[..., 1] - e0[:, None, 1]) - ex[:, None, 1] * (
            poly[..., 0] - e0[:, None, 0]
        )  # [K, S] signed distance (CCW inside ≥ 0)
        inside_geo = d >= 0
        inside = inside_geo & active
        p_next = jnp.roll(poly, -1, axis=1)
        d_next = jnp.roll(d, -1, axis=1)
        inside_next = jnp.roll(inside_geo, -1, axis=1)
        # intersection point of segment (p, p_next) with the clip line
        denom = d - d_next
        t = d / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        xpt = poly + t[..., None] * (p_next - poly)
        crossing = (inside_geo ^ inside_next) & active
        # emit: p if inside, then xpt if crossing → interleaved 2S buffer
        emit_pts = jnp.stack([poly, xpt], axis=2).reshape(K, 2 * S, 2)
        emit_ok = jnp.stack([inside, crossing], axis=2).reshape(K, 2 * S)
        # compact to S slots via one-hot matmul
        pos = jnp.cumsum(emit_ok.astype(jnp.int32), axis=1) - 1  # [K, 2S]
        onehot = (
            (pos[:, :, None] == jnp.arange(S)[None, None, :])
            & emit_ok[:, :, None]
        ).astype(boxes_a.dtype)  # [K, 2S, S]
        poly = jnp.einsum('kes,ke2->ks2', onehot, emit_pts)
        nvert = jnp.minimum(jnp.sum(emit_ok, axis=1), S).astype(jnp.int32)

    # shoelace over the (ordered) clipped polygon; pads again duplicate the
    # first vertex so roll(-1) closes the cycle and pad edges contribute 0
    active = slot < nvert[:, None]
    poly = jnp.where(active[..., None], poly, poly[:, :1])
    p_next = jnp.roll(poly, -1, axis=1)
    crossz = poly[..., 0] * p_next[..., 1] - poly[..., 1] * p_next[..., 0]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(active, crossz, 0.0), axis=1))
    return jnp.where(nvert >= 3, area, 0.0)


def _intersection_area_pair(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Single pair [7] x [7] → scalar BEV intersection area (vmap over pairs)."""
    pa = boxes_to_corners_bev(box_a)  # [4,2]
    pb = boxes_to_corners_bev(box_b)

    cand = jnp.zeros((24, 2), box_a.dtype)
    valid = jnp.zeros((24,), bool)
    cand = cand.at[0:4].set(pa)
    valid = valid.at[0:4].set(_corners_in_box(pa, box_b))
    cand = cand.at[4:8].set(pb)
    valid = valid.at[4:8].set(_corners_in_box(pb, box_a))

    a1, a2 = pa, jnp.roll(pa, -1, axis=0)
    b1, b2 = pb, jnp.roll(pb, -1, axis=0)
    r = a2 - a1  # [4,2]
    sv = b2 - b1
    qp = b1[None, :, :] - a1[:, None, :]  # [4,4,2]
    rxs = r[:, None, 0] * sv[None, :, 1] - r[:, None, 1] * sv[None, :, 0]
    qpxs = qp[..., 0] * sv[None, :, 1] - qp[..., 1] * sv[None, :, 0]
    qpxr = qp[..., 0] * r[:, None, 1] - qp[..., 1] * r[:, None, 0]
    nz = jnp.abs(rxs) > _EPS
    denom = jnp.where(nz, rxs, 1.0)
    t = qpxs / denom
    u = qpxr / denom
    ok = nz & (t >= -1e-6) & (t <= 1 + 1e-6) & (u >= -1e-6) & (u <= 1 + 1e-6)
    pt = a1[:, None, :] + t[..., None] * r[:, None, :]
    cand = cand.at[8:24].set(pt.reshape(16, 2))
    valid = valid.at[8:24].set(ok.reshape(16))

    nval = jnp.sum(valid)
    centroid = jnp.sum(jnp.where(valid[:, None], cand, 0.0), axis=0) / jnp.maximum(
        nval, 1
    )
    rel = cand - centroid
    ang = jnp.where(valid, jnp.arctan2(rel[:, 1], rel[:, 0]), jnp.inf)
    order = jnp.argsort(ang)
    rel_sorted = rel[order]
    valid_sorted = valid[order]
    first = rel_sorted[0]
    rel_sorted = jnp.where(valid_sorted[:, None], rel_sorted, first)
    nxt = jnp.roll(rel_sorted, -1, axis=0)
    cross = rel_sorted[:, 0] * nxt[:, 1] - rel_sorted[:, 1] * nxt[:, 0]
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(nval >= 3, area, 0.0)


def intersection_area_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] x [M, 7] → [N, M] via the flat Sutherland–Hodgman kernel."""
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    a = jnp.repeat(boxes_a, M, axis=0)  # [N*M, 7]
    b = jnp.tile(boxes_b, (N, 1))
    return _sh_intersection_area_flat(a, b).reshape(N, M)


def boxes_iou_bev(boxes_a, boxes_b):
    inter = intersection_area_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def boxes_iou3d(boxes_a, boxes_b):
    inter_bev = intersection_area_bev(boxes_a, boxes_b)
    amax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    amin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    bmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    bmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    inter_h = jnp.clip(jnp.minimum(amax, bmax) - jnp.maximum(amin, bmin), 0)
    inter = inter_bev * inter_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)


def boxes_iou3d_aligned(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Elementwise IoU3D over ALIGNED pairs: [..., 7] x [..., 7] → [...].

    The diagonal of ``boxes_iou3d`` without the O(N²) pair matrix — used by the
    CenterHead IoU-head loss (reference ``IoULossCenterNet``,
    loss_utils.py:399-419, which takes torch.diagonal of the full matrix)."""
    shp = boxes_a.shape[:-1]
    a = boxes_a.reshape(-1, boxes_a.shape[-1])[:, :7]
    b = boxes_b.reshape(-1, boxes_b.shape[-1])[:, :7]
    inter_bev = _sh_intersection_area_flat(a, b)
    amax, amin = a[:, 2] + a[:, 5] / 2, a[:, 2] - a[:, 5] / 2
    bmax, bmin = b[:, 2] + b[:, 5] / 2, b[:, 2] - b[:, 5] / 2
    inter_h = jnp.clip(jnp.minimum(amax, bmax) - jnp.maximum(amin, bmin), 0)
    inter = inter_bev * inter_h
    vol_a = a[:, 3] * a[:, 4] * a[:, 5]
    vol_b = b[:, 3] * b[:, 4] * b[:, 5]
    iou = inter / jnp.clip(vol_a + vol_b - inter, 1e-6)
    return iou.reshape(shp)


def nms_bev_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                 thresh: float, post_maxsize: int,
                 block: int = 16) -> jnp.ndarray:
    """Greedy rotated-BEV NMS over a fixed box budget.

    boxes [K, 7] must be sorted by descending score with ``valid`` marking real
    entries (the decode path provides exactly this). Returns keep mask [K] with at
    most ``post_maxsize`` True entries. Matches ``nms_gpu`` + post_max slicing in
    ``model_nms_utils.class_agnostic_nms`` (model_nms_utils.py:6-25).

    Blocked early-exit formulation (the reference kernel's 64-box tiling idea,
    iou3d_nms_kernel.cu): the rotated-IoU rows are computed per ``block`` of
    candidates INSIDE a ``while_loop`` that stops once the valid candidates
    are exhausted — both the IoU work and the sequential scan scale with the
    real candidate count instead of the static K (a trained model at
    SCORE_THRESH 0.1 passes far fewer than K=500 candidates).

    ``static_trips=True`` (or TMAE_NMS_STATIC=1) trades the early exit for a
    FIXED trip count over every block: each dispatch then has a
    data-independent execution profile, which keeps the axon relay's
    dispatch pipelining intact (the dynamic while_loop was measured to
    serialize the stateless serving loop, STATUS r4 #7) — per-block work is
    still skipped via a cheap predicate on the alive mask."""
    import os as _os
    static_trips = bool(_os.environ.get('TMAE_NMS_STATIC'))
    K = boxes.shape[0]
    pad = (-K) % block
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    Kp = K + pad
    n = jnp.sum(valid.astype(jnp.int32))

    def body_core(blk, alive, kept):
        start = blk * block
        bb = jax.lax.dynamic_slice_in_dim(boxes, start, block, 0)
        sup = boxes_iou_bev(bb, boxes) > thresh  # [block, Kp]

        def row(i, st2):
            alive, kept = st2
            idx = start + i
            is_kept = alive[idx] & valid[idx]
            # kept box suppresses everything it overlaps (incl. itself; idx
            # is never revisited so that is harmless)
            alive = alive & ~(sup[i] & is_kept)
            kept = kept.at[idx].set(is_kept)
            return alive, kept

        return jax.lax.fori_loop(0, block, row, (alive, kept), unroll=block)

    if static_trips:
        def body_fix(blk, st):
            alive, kept = st
            # skip blocks past the candidate count (predicated, not a
            # loop-trip change: the dispatch shape stays static)
            return jax.lax.cond(
                blk * block < n,
                lambda s: body_core(blk, *s),
                lambda s: s,
                (alive, kept),
            )

        _, kept = jax.lax.fori_loop(
            0, Kp // block, body_fix,
            (jnp.ones((Kp,), bool), jnp.zeros((Kp,), bool)))
    else:
        def cond(st):
            blk, alive, kept = st
            return blk * block < n

        def body(st):
            blk, alive, kept = st
            alive, kept = body_core(blk, alive, kept)
            return blk + 1, alive, kept

        _, _, kept = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.ones((Kp,), bool), jnp.zeros((Kp,), bool)),
        )
    kept = kept[:K]
    # cap to post_maxsize highest-score survivors
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    return kept & (rank < post_maxsize)
