"""Waymo artifact creation from decoded frames: the per-sequence npy+pkl
layout feeds WaymoTemporalDataset end-to-end, and the gt database feeds the
sampler (TFRecord decoding itself is env-gated; see
tools/create_waymo_infos.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader


def make_frames(rng, n=3):
    frames = []
    for fi in range(n):
        pts = np.zeros((300, 6), np.float32)
        pts[:, 5] = -1.0  # NLZ: -1 = keep
        pts[:, 0:2] = rng.uniform(-20, 20, (300, 2))
        pts[:, 2] = rng.uniform(-1, 2, 300)
        pts[:, 3] = rng.uniform(0, 20, 300)
        box = np.array([5.0, 1.0 * fi, 0.5, 4.5, 2.0, 1.6, 0.2], np.float32)
        inside = np.zeros((25, 6), np.float32)
        inside[:, 5] = -1.0
        inside[:, :3] = box[:3] + rng.uniform(-0.4, 0.4, (25, 3))
        pts = np.vstack([pts, inside])
        pose = np.eye(4)
        pose[:3, 3] = [fi * 0.5, 0, 0]
        frames.append({
            'points': pts,
            'pose': pose,
            'context_name': 'ctx_test',
            'timestamp_micros': 1000 + fi,
            'annos': {
                'name': np.asarray(['Vehicle']),
                'gt_boxes_lidar': box[None],
            },
        })
    return frames


def test_build_artifacts_feed_dataset(tmp_path):
    import create_waymo_infos as cwi

    rng = np.random.RandomState(0)
    root = tmp_path
    data = root / 'waymo_processed_data'
    (root / 'ImageSets').mkdir()
    (root / 'ImageSets' / 'val.txt').write_text('seq_a\n')

    infos = cwi.build_sequence_artifacts(make_frames(rng), 'seq_a', data)
    assert (data / 'seq_a' / 'seq_a.pkl').exists()
    assert (data / 'seq_a' / '0000.npy').exists()
    assert infos[0]['annos']['num_points_in_gt'][0] >= 25
    assert infos[0]['metadata']['context_name'] == 'ctx_test'

    cfg = Cfg.from_dict({
        'DATASET': 'WaymoTemporalDataset',
        'POINT_CLOUD_RANGE': [-25.0, -25.0, -2.0, 25.0, 25.0, 4.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'SCAN_WINDOW': 3,
        'PROCESSED_DATA_TAG': 'waymo_processed_data',
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.5, 0.5, 6.0]},
        ],
    })
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [256], 'MAX_GT': 8}
    ds, loader = build_dataloader(
        cfg, ['Vehicle', 'Pedestrian', 'Cyclist'], batch_size=1,
        training=False, runtime_cfg=runtime, root_path=str(root), seed=0,
    )
    assert len(ds) >= 1
    batch = next(iter(loader))
    assert batch['points'].shape[0] == 1
    assert batch['point_mask'].sum() > 0

    db = cwi.create_gt_database(root, infos, data, 'train')
    assert 'Vehicle' in db and len(db['Vehicle']) == 3
    obj = np.fromfile(root / db['Vehicle'][0]['path'], np.float32).reshape(-1, 6)
    assert np.abs(obj[:, :3]).max() < 3.0  # object-centered


def test_nlz_from_range_images_alignment():
    """NLZ flags align 1:1 with frame_utils' point order: per-laser in
    calibration-name order, first return only, range>0 mask (the exact rule
    frame_utils.convert_range_image_to_point_cloud applies)."""
    import types

    import create_waymo_infos as cwi

    rng = np.random.RandomState(0)

    def mk_ri(h, w, seed):
        r = np.random.RandomState(seed)
        data = np.zeros((h, w, 4), np.float32)
        data[..., 0] = np.where(r.rand(h, w) < 0.6, r.rand(h, w) * 50, -1.0)
        data[..., 3] = np.where(r.rand(h, w) < 0.3, 1.0, -1.0)
        ri = types.SimpleNamespace(
            data=data.ravel().tolist(),
            shape=types.SimpleNamespace(dims=[h, w, 4]),
        )
        return ri, data

    ri1, d1 = mk_ri(4, 8, 1)
    ri2, d2 = mk_ri(2, 16, 2)
    ri1_ret2, _ = mk_ri(4, 8, 9)  # second return must be ignored
    range_images = {5: [ri2, ri1_ret2], 1: [ri1, ri1_ret2]}
    calibs = [types.SimpleNamespace(name=5), types.SimpleNamespace(name=1)]

    nlz = cwi.nlz_from_range_images(range_images, calibs)
    want = np.concatenate([
        d1[d1[..., 0] > 0][:, 3],  # laser 1 first (sorted by name)
        d2[d2[..., 0] > 0][:, 3],
    ])
    np.testing.assert_array_equal(nlz, want.astype(np.float32))
