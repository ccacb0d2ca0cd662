import numpy as np
import jax.numpy as jnp

from tmae_tpu.ops.pointnet2 import (
    farthest_point_sample, ball_query, gather_points, group_points,
    three_nn, three_interpolate, query_and_group,
)


def make_cloud(n=64, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(1, n, 3).astype(np.float32) * 5
    mask = np.ones((1, n), bool)
    return jnp.asarray(pts), jnp.asarray(mask)


def test_fps_spreads_points():
    # 4 clusters far apart: FPS with S=4 must pick one from each
    centers = np.array([[0, 0, 0], [50, 0, 0], [0, 50, 0], [50, 50, 0]],
                       np.float32)
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [c + rng.randn(16, 3).astype(np.float32) for c in centers]
    )[None]
    mask = np.ones((1, 64), bool)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), jnp.asarray(mask), 4))
    picked = pts[0][idx[0]]
    labels = {tuple((picked[i] / 25).round().astype(int)) for i in range(4)}
    assert len(labels) == 4  # one per cluster


def test_fps_ignores_invalid():
    pts, mask = make_cloud(16)
    m = np.asarray(mask).copy()
    m[0, 8:] = False
    idx = np.asarray(farthest_point_sample(pts, jnp.asarray(m), 8))
    assert idx.max() < 8


def test_ball_query_radius_and_wrap():
    xyz = jnp.asarray(np.array([[[0, 0, 0], [0.1, 0, 0], [5, 5, 5]]],
                               np.float32))
    xmask = jnp.asarray(np.ones((1, 3), bool))
    centers = jnp.asarray(np.array([[[0, 0, 0]]], np.float32))
    cmask = jnp.asarray(np.ones((1, 1), bool))
    idx, cnt = ball_query(1.0, 4, xyz, xmask, centers, cmask)
    assert int(cnt[0, 0]) == 2
    # wrap-repeat fills remaining slots with found indices
    assert set(np.asarray(idx[0, 0]).tolist()) == {0, 1}


def test_gather_group():
    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 6, 2))
    g = gather_points(feats, jnp.asarray([[2, 4]]))
    assert np.allclose(np.asarray(g[0, 0]), [4, 5])
    gp = group_points(feats, jnp.asarray([[[0, 5], [1, 1]]]))
    assert gp.shape == (1, 2, 2, 2)
    assert np.allclose(np.asarray(gp[0, 0, 1]), [10, 11])


def test_three_nn_interpolate_exact_at_known():
    known = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0],
                                   [3, 3, 3]]], np.float32))
    kmask = jnp.asarray(np.ones((1, 4), bool))
    feats = jnp.asarray(np.array([[[1.0], [2.0], [3.0], [9.0]]], np.float32))
    unknown = known[:, :3]
    dist, idx = three_nn(unknown, known, kmask)
    out = three_interpolate(feats, idx, dist)
    # at known locations, interpolation reproduces the feature
    assert np.allclose(np.asarray(out[0, :, 0]), [1.0, 2.0, 3.0], atol=1e-3)


def test_query_and_group_relative_coords():
    xyz, xmask = make_cloud(32)
    centers = xyz[:, :4]
    cmask = jnp.asarray(np.ones((1, 4), bool))
    grouped, idx, cnt = query_and_group(2.0, 8, xyz, xmask, centers, cmask)
    assert grouped.shape == (1, 4, 8, 3)
    # the center itself is in its own ball with relative coord ~0
    mins = np.abs(np.asarray(grouped)).sum(-1).min(-1)
    assert np.allclose(mins[0], 0.0, atol=1e-5)
