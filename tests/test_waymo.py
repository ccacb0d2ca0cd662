"""Waymo temporal dataset: synthetic on-disk fixture exercising the real file
layout (per-sequence npy + info pkls), NLZ filtering, pose alignment, intervals."""

import pickle

import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.datasets.waymo_temporal import (
    WaymoTemporalDataset, align_prev_to_cur,
)

CLASSES = ['Vehicle', 'Pedestrian', 'Cyclist']


def make_waymo_fixture(root, n_seq=2, n_frames=4):
    rng = np.random.RandomState(0)
    (root / 'ImageSets').mkdir(parents=True)
    seq_names = [f'segment-{i:03d}' for i in range(n_seq)]
    (root / 'ImageSets' / 'train.txt').write_text(
        '\n'.join(s + '.tfrecord' for s in seq_names)
    )
    (root / 'ImageSets' / 'val.txt').write_text(
        '\n'.join(s + '.tfrecord' for s in seq_names)
    )
    data_dir = root / 'waymo_processed_data'
    for seq in seq_names:
        seq_dir = data_dir / seq
        seq_dir.mkdir(parents=True)
        infos = []
        for fi in range(n_frames):
            n = 300
            pts = np.zeros((n, 6), np.float32)
            pts[:, 0:3] = rng.uniform(-30, 30, (n, 3))
            pts[:, 3] = rng.uniform(0, 3, n)  # raw intensity (pre-tanh)
            pts[:, 4] = rng.uniform(0, 1, n)
            pts[:, 5] = np.where(rng.rand(n) < 0.9, -1, 1)  # 10% in NLZ
            np.save(seq_dir / f'{fi:04d}.npy', pts)
            pose = np.eye(4)
            pose[:3, 3] = [fi * 1.0, 0, 0]  # ego moves 1 m/frame in x
            boxes = np.array([[5.0, 2.0, 0.0, 4.5, 2.0, 1.6, 0.2],
                              [-3.0, -8.0, 0.0, 0.8, 0.8, 1.7, 0.0]],
                             np.float32)
            infos.append({
                'point_cloud': {'lidar_sequence': seq, 'sample_idx': fi},
                'pose': pose,
                'annos': {
                    'name': np.array(['Vehicle', 'Pedestrian']),
                    'gt_boxes_lidar': boxes,
                    'num_points_in_gt': np.array([10, 5]),
                },
            })
        with open(seq_dir / f'{seq}.pkl', 'wb') as f:
            pickle.dump(infos, f)
    return root


def _cfg(root):
    return Cfg.from_dict({
        'DATASET': 'WaymoTemporalDataset',
        'DATA_PATH': str(root),
        'PROCESSED_DATA_TAG': 'waymo_processed_data',
        'POINT_CLOUD_RANGE': [-74.88, -74.88, -2, 74.88, 74.88, 4.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'SCAN_WINDOW': 2,
        'ALIGN_TWO_FRAMES': True,
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.32, 0.32, 6.0]},
        ],
    })


def test_align_prev_to_cur():
    pts = np.array([[1.0, 0, 0, 0.5, 0.1]], np.float32)
    pose_prev = np.eye(4)
    pose_cur = np.eye(4)
    pose_cur[:3, 3] = [2.0, 0, 0]  # ego advanced 2 m
    out = align_prev_to_cur(pts, pose_prev, pose_cur)
    # a point 1 m ahead in the old frame is 1 m behind in the new frame
    assert np.allclose(out[0, :3], [-1.0, 0, 0], atol=1e-6)
    assert np.allclose(out[0, 3:], pts[0, 3:])


def test_waymo_dataset_loads(tmp_path):
    root = make_waymo_fixture(tmp_path)
    cfg = _cfg(root)
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, loader = build_dataloader(
        cfg, CLASSES, batch_size=2, training=False, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    # 2 seqs x 4 frames / window 2 = 4 intervals
    assert len(ds) == 4
    batch = next(iter(loader))
    assert batch['points'].shape == (2, 512, 5)
    assert batch['point_mask'].any()
    # NLZ-filtered (~270 of 300) and intensity tanh-compressed
    p = batch['points'][batch['point_mask']]
    assert p[:, 3].max() <= 1.0 + 1e-6
    assert batch['gt_boxes'].shape[-1] == 8


def test_waymo_eval_protocol(tmp_path):
    root = make_waymo_fixture(tmp_path)
    cfg = _cfg(root)
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, _ = build_dataloader(
        cfg, CLASSES, batch_size=1, training=False, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    det = []
    for itv in ds.intervals:
        info = ds.infos[itv[1] - 1]
        det.append({
            'name': np.asarray(info['annos']['name']),
            'boxes_3d': np.asarray(info['annos']['gt_boxes_lidar'])[:, :7],
            'score': np.array([0.9, 0.8]),
        })
    s, d = ds.evaluation(det, CLASSES, eval_metric='kitti')
    assert d['AP_Vehicle/overall'] == 100.0


def test_waymo_ap_aph_metrics(tmp_path):
    from tmae_tpu.datasets.waymo_eval import waymo_evaluation
    gt = [{
        'name': np.array(['Vehicle', 'Vehicle', 'Pedestrian']),
        'boxes_3d': np.array([[0, 0, 0, 4, 2, 1.6, 0.0],
                              [10, 0, 0, 4, 2, 1.6, 1.0],
                              [5, 5, 0, 0.8, 0.8, 1.7, 0.0]]),
        'num_points_in_gt': np.array([50, 3, 20]),  # 2nd vehicle is L2-only
    }]
    # perfect boxes; second vehicle predicted with heading flipped by pi
    pred_boxes = gt[0]['boxes_3d'].copy()
    pred_boxes[1, 6] += np.pi
    pred = [{
        'name': np.array(['Vehicle', 'Vehicle', 'Pedestrian']),
        'boxes_3d': pred_boxes,
        'score': np.array([0.9, 0.8, 0.85]),
    }]
    s, d = waymo_evaluation(gt, pred)
    # L1 vehicle: only the >5-point vehicle counts; matched exactly → AP 100
    assert d['Vehicle/L1/AP'] == 100.0
    assert d['Vehicle/L1/APH'] == 100.0
    # L2 includes the flipped-heading vehicle: AP 100 but APH penalized
    assert d['Vehicle/L2/AP'] == 100.0
    assert 0.0 < d['Vehicle/L2/APH'] < d['Vehicle/L2/AP']
    assert d['Pedestrian/L1/AP'] == 100.0
    assert 'mAPH/L2' in d


def test_waymo_dataset_eval_dispatch(tmp_path):
    root = make_waymo_fixture(tmp_path)
    cfg = _cfg(root)
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, _ = build_dataloader(
        cfg, CLASSES, batch_size=1, training=False, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    det = []
    for itv in ds.intervals:
        info = ds.infos[itv[1] - 1]
        det.append({
            'name': np.asarray(info['annos']['name']),
            'boxes_3d': np.asarray(info['annos']['gt_boxes_lidar'])[:, :7],
            'score': np.array([0.9, 0.8]),
        })
    s, d = ds.evaluation(det, CLASSES)  # waymo_custom AP/APH path
    assert d['Vehicle/L1/AP'] == 100.0
    assert d['Vehicle/L1/APH'] == 100.0
    # pedestrians (5 pts) are L2-only; cyclists absent
    assert d['Pedestrian/L1/AP'] == 0.0
    assert d['Pedestrian/L2/AP'] == 100.0


def test_waymo_shared_memory_cache(tmp_path):
    from pathlib import Path
    if not Path('/dev/shm').is_dir():
        return
    root = make_waymo_fixture(tmp_path)
    cfg = _cfg(root)
    cfg['USE_SHARED_MEMORY'] = True
    cfg['SHARED_MEMORY_FILE_LIMIT'] = 3
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, _ = build_dataloader(
        cfg, CLASSES, batch_size=1, training=True, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    try:
        assert ds.use_shared_memory
        cached = [i for i in ds.infos[:3]]
        for info in cached:
            pc = info['point_cloud']
            assert ds._shm_key(pc['lidar_sequence'],
                               pc['sample_idx']).exists()
        pc = cached[0]['point_cloud']
        via_shm = ds.get_lidar(pc['lidar_sequence'], pc['sample_idx'])
        via_disk = ds._get_lidar_from_disk(pc['lidar_sequence'],
                                           pc['sample_idx'])
        np.testing.assert_allclose(via_shm, via_disk)
    finally:
        ds.clean_shared_memory()
        pc = cached[0]['point_cloud']
        assert not ds._shm_key(pc['lidar_sequence'],
                               pc['sample_idx']).exists()


def test_waymo_mvjar_split_redirect(tmp_path):
    root = make_waymo_fixture(tmp_path)
    # MVJAR subset listing only sequence 0
    sub = root / 'MVJAR_Data_Efficient_Benchmark' / 'sequence_names'
    sub.mkdir(parents=True)
    (sub / 'waymo_infos_train_r_0.1_2_sequence_names.txt').write_text(
        'segment-000.tfrecord\n'
    )
    cfg = _cfg(root)
    cfg['DATA_EFFICIENT_BENCHMARK'] = {'percentile': 0.1, 'idx': 2}
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, _ = build_dataloader(
        cfg, CLASSES, batch_size=1, training=True, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    seqs = {i['point_cloud']['lidar_sequence'] for i in ds.infos}
    assert seqs == {'segment-000'}
    # val split is never redirected
    ds_val, _ = build_dataloader(
        cfg, CLASSES, batch_size=1, training=False, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    assert {i['point_cloud']['lidar_sequence'] for i in ds_val.infos} == {
        'segment-000', 'segment-001'
    }
