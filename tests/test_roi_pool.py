import jax.numpy as jnp
import numpy as np

from tmae_tpu.ops.roi_pool import (
    points_in_boxes, roipoint_pool3d, roiaware_pool3d,
)


def setup_scene():
    pts = np.array([[[0.2, 0.1, 0.0],     # in box 0
                     [0.4, -0.2, 0.1],    # in box 0
                     [5.0, 5.0, 0.0],     # in box 1
                     [20.0, 0.0, 0.0]]],  # outside
                   np.float32)
    pmask = np.ones((1, 4), bool)
    boxes = np.array([[[0, 0, 0, 2, 2, 2, 0.0],
                       [5, 5, 0, 2, 2, 2, 0.5],
                       [0, 0, 0, 0, 0, 0, 0]]], np.float32)
    bmask = np.array([[True, True, False]])
    return (jnp.asarray(pts), jnp.asarray(pmask), jnp.asarray(boxes),
            jnp.asarray(bmask))


def test_points_in_boxes():
    pts, pmask, boxes, bmask = setup_scene()
    idx = np.asarray(points_in_boxes(pts, boxes, bmask))
    assert idx[0].tolist() == [0, 0, 1, -1]


def test_roipoint_pool3d_canonical_and_wrap():
    pts, pmask, boxes, bmask = setup_scene()
    pooled, empty = roipoint_pool3d(pts, pmask, boxes, bmask, num_sampled=4)
    assert pooled.shape == (1, 3, 4, 3)
    p = np.asarray(pooled[0])
    # box 0: two points, wrap-repeated, canonical coords = raw (heading 0)
    assert np.allclose(sorted(p[0, :, 0].tolist()), [0.2, 0.2, 0.4, 0.4])
    # box 1 point canonicalized: (0,0) offset in rotated frame
    assert np.allclose(p[1, 0, :2], [0.0, 0.0], atol=1e-5)
    assert np.asarray(empty[0]).tolist() == [False, False, True]


def test_roiaware_pool3d():
    pts, pmask, boxes, bmask = setup_scene()
    feats = jnp.asarray(np.array([[[1.0], [2.0], [7.0], [9.0]]], np.float32))
    out = roiaware_pool3d(pts, pmask, feats, boxes, bmask, out_size=2,
                          num_sampled=4)
    assert out.shape == (1, 3, 2, 2, 2, 1)
    o = np.asarray(out[0])
    # box 0 contains features {1, 2}; both points are in +x half
    assert o[0].max() == 2.0
    # box 1 max-pools its single point's feature
    assert o[1].max() == 7.0
    # invalid box: all zeros
    assert o[2].max() == 0.0
