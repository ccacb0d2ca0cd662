import os
from pathlib import Path

import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.datasets.once_temporal import (
    convert_prv_frame_to_cur, quat_to_matrix, generate_intervals,
    remove_ego_points,
)
from tmae_tpu.datasets.augmentor import (
    WorldTransforms, points_in_boxes_mask, DataBaseSampler,
)

CLASS_NAMES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']


def _data_cfg(training_aug=True):
    cfg = {
        'DATASET': 'SyntheticONCEDataset',
        'POINT_CLOUD_RANGE': [-5.12, -5.12, -5.0, 5.12, 5.12, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'SCAN_WINDOW': 3,
        'NUM_SYNTHETIC_SAMPLES': 4,
        'SYNTHETIC_POINTS': 512,
        'SYNTHETIC_BOXES': 3,
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'shuffle_points',
             'SHUFFLE_ENABLED': {'train': True, 'test': False}},
            {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.32, 0.32, 8.0]},
        ],
    }
    if training_aug:
        cfg['DATA_AUGMENTOR'] = {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'random_world_flip', 'PROBABILITY': 0.5,
                 'ALONG_AXIS_LIST': ['x', 'y']},
                {'NAME': 'random_world_rotation', 'PROBABILITY': 1.0,
                 'WORLD_ROT_ANGLE': [-0.785, 0.785]},
                {'NAME': 'random_world_scaling', 'PROBABILITY': 1.0,
                 'WORLD_SCALE_RANGE': [0.95, 1.05]},
            ],
        }
    return Cfg.from_dict(cfg)


RUNTIME = {'MAX_POINTS': 768, 'MAX_VOXELS': [128], 'MAX_GT': 8}


def test_pose_alignment_identity():
    pts = np.random.RandomState(0).randn(50, 4).astype(np.float32)
    pose = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)  # identity quat, no trans
    out = convert_prv_frame_to_cur(pts.copy(), pose, pose)
    assert np.allclose(out, pts, atol=1e-5)


def test_pose_alignment_translation():
    pts = np.zeros((1, 4), np.float32)
    pose_prv = np.array([0, 0, 0, 1, 1.0, 2.0, 0.0])
    pose_cur = np.array([0, 0, 0, 1, 0.0, 0.0, 0.0])
    out = convert_prv_frame_to_cur(pts.copy(), pose_prv, pose_cur)
    assert np.allclose(out[0, :3], [1.0, 2.0, 0.0], atol=1e-6)


def test_quat_matrix_rotation():
    # 90° around z: q = [0, 0, sin(45°), cos(45°)]
    q = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    R = quat_to_matrix(q)
    v = R @ np.array([1.0, 0, 0])
    assert np.allclose(v, [0, 1, 0], atol=1e-9)


def test_generate_intervals():
    assert generate_intervals([7], 3) == [(0, 3), (3, 6), (6, 7)]
    assert generate_intervals([3, 4], 3) == [(0, 3), (3, 6), (6, 7)]


def test_remove_ego_points():
    pts = np.array([[0.5, 0.5, 0, 0], [3, 3, 0, 0]], np.float32)
    assert len(remove_ego_points(pts, 1.0)) == 1


def test_flip_consistency_between_frames():
    rng = np.random.RandomState(0)
    data = {
        'points': np.array([[1.0, 2.0, 0.0, 0.5]], np.float32),
        'points_prev': np.array([[1.0, 2.0, 0.0, 0.5]], np.float32),
        'gt_boxes': np.array([[1.0, 2.0, 0, 4, 2, 1.6, 0.3]], np.float32),
    }

    class FixedRng:
        def rand(self):
            return 0.0  # always enable

        def uniform(self, lo, hi):
            return hi

    out = WorldTransforms.random_world_flip(
        {k: v.copy() for k, v in data.items()},
        {'ALONG_AXIS_LIST': ['x'], 'PROBABILITY': 1.0}, FixedRng(),
    )
    assert np.allclose(out['points'], out['points_prev'])
    assert out['points'][0, 1] == -2.0
    assert out['gt_boxes'][0, 1] == -2.0 and out['gt_boxes'][0, 6] == -0.3


def test_points_in_boxes_mask():
    pts = np.array([[0, 0, 0, 0], [10, 10, 0, 0]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.5]], np.float32)
    m = points_in_boxes_mask(pts, boxes)
    assert m.tolist() == [True, False]


def test_database_sampler_pastes_both_frames():
    rng = np.random.RandomState(0)
    sampler = DataBaseSampler(
        None,
        {'SAMPLE_GROUPS': ['Car:2'], 'NUM_POINT_FEATURES': 4},
        CLASS_NAMES, rng=rng,
    )
    # inject a fake db with in-memory points (object-centered)
    obj_pts = np.array([[0.2, 0.0, 0.0, 1.0], [-0.2, 0.1, 0.0, 1.0]], np.float32)
    sampler.db_infos['Car'] = [
        {'box3d_lidar': np.array([3.0, 3.0, 0, 4, 2, 1.6, 0.0]),
         'points': obj_pts, 'num_points_in_gt': 2},
        {'box3d_lidar': np.array([-3.0, -3.0, 0, 4, 2, 1.6, 0.0]),
         'points': obj_pts, 'num_points_in_gt': 2},
    ]
    sampler.sample_groups['Car']['pointer'] = 99
    data = {
        'points': np.zeros((5, 4), np.float32),
        'points_prev': np.zeros((5, 4), np.float32),
        'gt_boxes': np.zeros((0, 8), np.float32),
        'gt_names': np.asarray([], dtype='<U10'),
    }
    out = sampler(data)
    assert len(out['gt_boxes']) == 2
    # object points pasted into both frames at the box position
    assert (np.abs(out['points'][:, 0] - 3.0) < 1.0).any()
    assert (np.abs(out['points_prev'][:, 0] - 3.0) < 1.0).any()


def test_synthetic_dataset_loader():
    ds, loader = build_dataloader(
        _data_cfg(), CLASS_NAMES, batch_size=2, training=True,
        runtime_cfg=RUNTIME, seed=0,
    )
    batches = list(iter(loader))
    assert len(batches) == 2
    b = batches[0]
    assert b['points'].shape == (2, 768, 4)
    assert b['point_mask'].shape == (2, 768)
    assert b['points_prev'].shape == (2, 768, 4)
    assert b['gt_boxes'].shape == (2, 8, 8)
    assert b['gt_mask'].any()
    # gt labels are 1-indexed class ids
    labels = b['gt_boxes'][b['gt_mask']][:, 7]
    assert labels.min() >= 1 and labels.max() <= 5
    # points lie within range after processing
    pm = b['point_mask']
    assert np.abs(b['points'][pm][:, :2]).max() <= 5.12 + 1e-4


def test_loader_sharding():
    ds, loader0 = build_dataloader(
        _data_cfg(False), CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=RUNTIME, seed=0, process_index=0, process_count=2,
    )
    _, loader1 = build_dataloader(
        _data_cfg(False), CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=RUNTIME, seed=0, process_index=1, process_count=2,
    )
    ids0 = [b['frame_id'][0] for b in loader0]
    ids1 = [b['frame_id'][0] for b in loader1]
    assert len(ids0) == len(ids1) == 2
    assert set(ids0).isdisjoint(ids1)


def test_gt_sampler_shared_memory(tmp_path):
    import pickle as pkl

    if not Path('/dev/shm').is_dir():
        return  # platform without shm
    rng = np.random.RandomState(0)
    db_dir = tmp_path / 'gt_database'
    db_dir.mkdir()
    infos = {'Car': []}
    for i in range(3):
        pts = rng.randn(10 + i, 4).astype(np.float32)
        rel = f'gt_database/car_{i}.bin'
        pts.tofile(tmp_path / rel)
        infos['Car'].append({
            'name': 'Car', 'path': rel, 'num_points_in_gt': len(pts),
            'box3d_lidar': np.array([i * 5.0, 0, 0, 4, 2, 1.6, 0],
                                    np.float32),
        })
    with open(tmp_path / 'dbinfos.pkl', 'wb') as f:
        pkl.dump(infos, f)
    key = f'tmae_test_shm_{os.getpid()}'
    cfg = {
        'DB_INFO_PATH': ['dbinfos.pkl'],
        'SAMPLE_GROUPS': ['Car:2'],
        'NUM_POINT_FEATURES': 4,
        'USE_SHARED_MEMORY': True,
        'SHARED_MEMORY_KEY': key,
    }
    try:
        sampler = DataBaseSampler(tmp_path, cfg, ['Car'],
                                  rng=np.random.RandomState(1))
        assert sampler._shm_data is not None
        assert len(sampler._shm_offsets) == 3
        # shm slice must equal the file contents
        info = infos['Car'][1]
        via_shm = sampler._load_obj_points(info)
        via_file = np.fromfile(tmp_path / info['path'],
                               np.float32).reshape(-1, 4)
        np.testing.assert_array_equal(via_shm, via_file)
        # a second sampler attaches to the existing cache without rebuilding
        sampler2 = DataBaseSampler(tmp_path, cfg, ['Car'],
                                   rng=np.random.RandomState(2))
        assert sampler2._shm_data is not None
    finally:
        for suffix in ('.npy', '.offsets.pkl'):
            p = Path(f'/dev/shm/{key}{suffix}')
            if p.exists():
                p.unlink()
