import jax
import jax.numpy as jnp
import numpy as np

from tmae_tpu.config import Cfg
from tmae_tpu.models.vsa import VoxelSetAbstraction, bilinear_interpolate


def test_bilinear_interpolate():
    grid = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # exact grid points
    v = bilinear_interpolate(grid, jnp.asarray([1.0]), jnp.asarray([2.0]))
    assert np.isclose(float(v[0, 0]), grid[2, 1, 0])
    # midpoint of 4 cells
    v = bilinear_interpolate(grid, jnp.asarray([0.5]), jnp.asarray([0.5]))
    assert np.isclose(float(v[0, 0]), np.mean([0, 1, 4, 5]))


def test_vsa_forward():
    rng = np.random.RandomState(0)
    B, P = 2, 128
    points = jnp.asarray(
        np.c_[rng.uniform(-4, 4, (B * P, 3)),
              rng.uniform(0, 1, (B * P, 1))].astype(np.float32).reshape(B, P, 4)
    )
    pmask = jnp.asarray(np.ones((B, P), bool))
    bev = jnp.asarray(rng.randn(B, 32, 32, 8).astype(np.float32))
    centers = jnp.asarray(rng.uniform(-4, 4, (B, 32, 3)).astype(np.float32))
    vmask = jnp.asarray(np.ones((B, 32), bool))
    vfeats = jnp.asarray(rng.randn(B, 32, 6).astype(np.float32))
    cfg = Cfg.from_dict({
        'NUM_KEYPOINTS': 16,
        'FEATURES_SOURCE': ['bev', 'raw_points', 'x_conv1'],
        'SA_LAYER': {
            'raw_points': {'POOL_RADIUS': [0.8], 'NSAMPLE': [8],
                           'MLPS': [[8, 8]]},
            'x_conv1': {'POOL_RADIUS': [1.2], 'NSAMPLE': [8],
                        'MLPS': [[8, 8]]},
        },
        'NUM_OUTPUT_FEATURES': 16,
    })
    vsa = VoxelSetAbstraction(cfg, voxel_size=(0.25, 0.25, 8.0),
                              pc_range=(-4, -4, -4, 4, 4, 4))
    variables = vsa.init(
        jax.random.PRNGKey(0), points, pmask, False, bev_features=bev,
        bev_stride=1, voxel_sources={'x_conv1': (centers, vmask, vfeats)},
    )
    kp, feats, kmask = vsa.apply(
        variables, points, pmask, False, bev_features=bev, bev_stride=1,
        voxel_sources={'x_conv1': (centers, vmask, vfeats)},
    )
    assert kp.shape == (B, 16, 3)
    assert feats.shape == (B, 16, 16)
    assert np.all(np.isfinite(np.asarray(feats)))
