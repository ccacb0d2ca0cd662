"""3D sparse conv ops + SECONDNet shell."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.models.detectors import build_detector
from tmae_tpu.ops.sparse3d import (
    build_index_grid, gather_neighbors, sparse_conv3d_apply,
    downsample_coords_3d,
)

CLASS_NAMES = ['Car', 'Pedestrian']


def test_subm_conv3d_matches_dense():
    """Sparse gather conv == dense 3D conv at active sites."""
    rng = np.random.RandomState(0)
    D = H = W = 6
    V = 16
    cells = rng.permutation(D * H * W)[:10]
    coords = np.zeros((1, V, 3), np.int32)
    coords[0, :10, 0] = cells // (H * W)
    coords[0, :10, 1] = (cells // W) % H
    coords[0, :10, 2] = cells % W
    mask = np.zeros((1, V), bool)
    mask[0, :10] = True
    C = 4
    feat = rng.randn(1, V, C).astype(np.float32)
    feat[~mask] = 0
    wts = rng.randn(27, C, 5).astype(np.float32) * 0.1

    ig = build_index_grid(jnp.asarray(coords), jnp.asarray(mask), (D, H, W))
    nb = gather_neighbors(ig, jnp.asarray(coords), jnp.asarray(mask),
                          (D, H, W), kernel=3, stride=1)
    out = np.asarray(sparse_conv3d_apply(jnp.asarray(feat), nb,
                                         jnp.asarray(wts)))

    # dense reference: scatter features, conv via explicit loop
    dense = np.zeros((D, H, W, C), np.float32)
    for v in range(10):
        z, y, x = coords[0, v]
        dense[z, y, x] = feat[0, v]
    k = 0
    ref_out = np.zeros((D, H, W, 5), np.float32)
    for dz in range(-1, 2):
        for dy in range(-1, 2):
            for dx in range(-1, 2):
                shifted = np.zeros_like(dense)
                zs = slice(max(0, -dz), D - max(0, dz))
                ys = slice(max(0, -dy), H - max(0, dy))
                xs = slice(max(0, -dx), W - max(0, dx))
                zd = slice(max(0, dz), D - max(0, -dz))
                yd = slice(max(0, dy), H - max(0, -dy))
                xd = slice(max(0, dx), W - max(0, -dx))
                shifted[zs, ys, xs] = dense[zd, yd, xd]
                ref_out += shifted @ wts[k]
                k += 1
    for v in range(10):
        z, y, x = coords[0, v]
        assert np.allclose(out[0, v], ref_out[z, y, x], atol=1e-4), v


def test_downsample_coords_3d():
    coords = np.zeros((1, 4, 3), np.int32)
    coords[0, 0] = [1, 5, 4]
    mask = np.zeros((1, 4), bool)
    mask[0, 0] = True
    new_c, new_m, out_dhw = downsample_coords_3d(
        jnp.asarray(coords), jnp.asarray(mask), (8, 8, 8), 2, 1, 3, 8
    )
    assert out_dhw == (4, 4, 4)
    got = {tuple(c) for c, m in zip(np.asarray(new_c[0]), np.asarray(new_m[0]))
           if m}
    # input (1,5,4): outputs o where 2o-1 <= c <= 2o+1 → z∈{0,1}, y∈{2,3}, x∈{2}
    expect = {(z, y, 2) for z in (0, 1) for y in (2, 3)}
    assert got == expect, got


@pytest.mark.slow
def test_second_net_forward():
    cfg = Cfg.from_dict({
        'CLASS_NAMES': CLASS_NAMES,
        'DATA_CONFIG': {
            'DATASET': 'SyntheticONCEDataset',
            'POINT_CLOUD_RANGE': [-5.12, -5.12, -3.0, 5.12, 5.12, 1.0],
            # z-extent must survive the 4 stride-2 z-compressions (real SECOND
            # configs use nz≈40)
            'DATA_SPLIT': {'train': 'train', 'test': 'val'},
            'NUM_SYNTHETIC_SAMPLES': 2, 'SYNTHETIC_POINTS': 512,
            'SYNTHETIC_BOXES': 2,
            'DATA_PROCESSOR': [
                {'NAME': 'mask_points_and_boxes_outside_range',
                 'REMOVE_OUTSIDE_BOXES': True},
                {'NAME': 'transform_points_to_voxels',
                 'VOXEL_SIZE': [0.32, 0.32, 0.1],
                 'MAX_POINTS_PER_VOXEL': 5,
                 'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
            ],
        },
        'MODEL': {
            'NAME': 'SECONDNet',
            'VFE': {'NAME': 'MeanVFE'},
            'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
            'BACKBONE_2D': {
                'NAME': 'BaseBEVBackbone',
                'LAYER_NUMS': [2], 'LAYER_STRIDES': [1],
                'NUM_FILTERS': [32], 'UPSAMPLE_STRIDES': [1],
                'NUM_UPSAMPLE_FILTERS': [32],
            },
            'DENSE_HEAD': {
                'NAME': 'AnchorHeadSingle',
                'ANCHOR_GENERATOR_CONFIG': [
                    {'class_name': c, 'anchor_sizes': [[4.0, 2.0, 1.6]],
                     'anchor_rotations': [0, 1.57],
                     'anchor_bottom_heights': [-1.78],
                     'align_center': False, 'feature_map_stride': 8,
                     'matched_threshold': 0.5, 'unmatched_threshold': 0.35}
                    for c in CLASS_NAMES
                ],
                'TARGET_ASSIGNER_CONFIG': {'BOX_CODER_CONFIG': {}},
                'USE_DIRECTION_CLASSIFIER': False,
                'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                    'cls_weight': 1.0, 'loc_weight': 2.0,
                    'code_weights': [1.0] * 7}},
            },
        },
        'RUNTIME': {'MAX_POINTS': 768, 'MAX_VOXELS': [256, 128, 64, 64, 64],
                    'MAX_GT': 8},
        'OPTIMIZATION': {'BATCH_SIZE_PER_GPU': 2, 'NUM_EPOCHS': 1,
                         'OPTIMIZER': 'adam', 'LR': 1e-3,
                         'WEIGHT_DECAY': 0.01, 'GRAD_NORM_CLIP': 10},
    })
    ds, loader = build_dataloader(
        cfg.DATA_CONFIG, CLASS_NAMES, batch_size=2, training=True,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    assert batch['voxel_coords_zyx'].shape == (2, 256, 3)
    model = build_detector(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'frame_id'}
    variables = model.init(jax.random.PRNGKey(0), jbatch, train=False)
    out = model.apply(variables, jbatch, train=False)
    assert np.all(np.isfinite(np.asarray(out['spatial_features_2d'])))
    assert out["anchor_outputs"]["cls_preds"].shape[-1] == 8  # 4 anchors x 2 cls
