import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.ops import geometry as geo
from tmae_tpu.ops import geometry_np as gnp


def box(x, y, z, dx, dy, dz, ang):
    return np.array([x, y, z, dx, dy, dz, ang], np.float32)


def test_axis_aligned_iou():
    a = box(0, 0, 0, 2, 2, 2, 0)[None]
    b = box(1, 0, 0, 2, 2, 2, 0)[None]
    iou = gnp.boxes_iou_bev(a, b)
    # inter = 1x2=2, union = 4+4-2=6
    assert np.allclose(iou, 2 / 6, atol=1e-5)
    iou3 = gnp.boxes_iou3d(a, b)
    assert np.allclose(iou3, 4 / (8 + 8 - 4), atol=1e-5)


def test_rotated_45_iou():
    # square rotated 45° inside same-center square: inter = 2*(sqrt2/2)^2... known
    # analytic value: unit squares, one rotated 45°, same center:
    # intersection is a regular octagon with area 8*(sqrt(2)-1)/2 = 4(sqrt2-1)? Use
    # side 2 squares: area 4 each; octagon area = 8*(2*(sqrt(2)-1)) ... compute
    # numerically instead via dense sampling.
    a = box(0, 0, 0, 2, 2, 2, 0)[None]
    b = box(0, 0, 0, 2, 2, 2, np.pi / 4)[None]
    inter = gnp.intersection_area_bev(a, b)[0, 0]
    xs = np.linspace(-1.5, 1.5, 601)
    X, Y = np.meshgrid(xs, xs)
    in_a = (np.abs(X) <= 1) & (np.abs(Y) <= 1)
    r = np.pi / 4
    U = X * np.cos(r) + Y * np.sin(r)
    V = -X * np.sin(r) + Y * np.cos(r)
    in_b = (np.abs(U) <= 1) & (np.abs(V) <= 1)
    mc = (in_a & in_b).mean() * 3.0 * 3.0
    assert abs(inter - mc) < 0.02


def test_disjoint_and_identical():
    a = box(0, 0, 0, 2, 2, 2, 0.3)[None]
    b = box(10, 10, 0, 2, 2, 2, 1.0)[None]
    assert gnp.boxes_iou_bev(a, b)[0, 0] == 0.0
    assert np.allclose(gnp.boxes_iou_bev(a, a)[0, 0], 1.0, atol=1e-4)


def test_heading_filter():
    a = box(0, 0, 0, 2, 2, 2, 0.0)[None]
    b = box(0, 0, 0, 2, 2, 2, np.pi)[None]
    assert gnp.boxes_iou3d_with_heading(a, b)[0, 0] == 0.0
    c = box(0, 0, 0, 2, 2, 2, 0.1)[None]
    assert gnp.boxes_iou3d_with_heading(a, c)[0, 0] > 0.8


def test_jax_matches_numpy():
    rng = np.random.RandomState(0)
    n, m = 12, 9
    boxes_a = np.stack(
        [box(*rng.uniform(-5, 5, 2), rng.uniform(-1, 1), *rng.uniform(1, 4, 3),
             rng.uniform(-np.pi, np.pi)) for _ in range(n)]
    )
    boxes_b = np.stack(
        [box(*rng.uniform(-5, 5, 2), rng.uniform(-1, 1), *rng.uniform(1, 4, 3),
             rng.uniform(-np.pi, np.pi)) for _ in range(m)]
    )
    i_np = gnp.boxes_iou3d(boxes_a, boxes_b)
    i_jx = np.asarray(geo.boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    assert np.allclose(i_np, i_jx, atol=2e-3)


def test_nms_numpy_and_jax_agree():
    rng = np.random.RandomState(1)
    K = 32
    base = box(0, 0, 0, 4, 2, 2, 0.3)
    boxes = np.stack([base + np.r_[rng.uniform(-3, 3, 2), np.zeros(4),
                                   rng.uniform(-0.2, 0.2)] for _ in range(K)]
                     ).astype(np.float32)
    scores = np.sort(rng.uniform(0.1, 1.0, K).astype(np.float32))[::-1].copy()
    keep_np = gnp.nms_bev(boxes, scores, thresh=0.5)
    mask_jx = np.asarray(
        geo.nms_bev_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(K, bool), 0.5, K
        )
    )
    assert set(keep_np.tolist()) == set(np.nonzero(mask_jx)[0].tolist())


def test_nms_post_maxsize():
    boxes = np.stack([box(i * 10.0, 0, 0, 2, 2, 2, 0) for i in range(6)]).astype(
        np.float32
    )
    scores = np.linspace(1.0, 0.5, 6).astype(np.float32)
    mask = np.asarray(
        geo.nms_bev_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.ones(6, bool), 0.5, 3)
    )
    assert mask.sum() == 3 and mask[:3].all()
