"""Info/gt-database creation over a synthetic raw-ONCE fixture, then the real
dataset class + gt-sampling augmentor consume the outputs end-to-end."""

import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader

from once_fixture import CLASSES, make_raw_once


def test_create_infos_and_gt_database(tmp_path):
    import create_once_infos as coi
    root = make_raw_once(tmp_path)
    infos = coi.create_infos(root, 'train')
    assert len(infos) == 4
    assert (root / 'once_infos_train.pkl').exists()
    assert infos[0]['annos']['num_points_in_gt'][0] >= 30

    db = coi.create_gt_database(root, infos, 'train')
    assert 'Car' in db and len(db['Car']) == 4
    obj_path = root / db['Car'][0]['path']
    obj = np.fromfile(obj_path, np.float32).reshape(-1, 4)
    # object-centered points
    assert np.abs(obj[:, :3]).max() < 3.0

    # the real dataset + gt-sampling pipeline consumes these artifacts
    cfg = Cfg.from_dict({
        'DATASET': 'ONCETemporalDataset',
        'POINT_CLOUD_RANGE': [-74.88, -74.88, -5.0, 74.88, 74.88, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'SCAN_WINDOW': 3,
        'ALIGN_TWO_FRAMES': True,
        'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': [
                {'NAME': 'gt_sampling',
                 'DB_INFO_PATH': ['once_dbinfos_train.pkl'],
                 'PREPARE': {'filter_by_min_points': ['Car:5']},
                 'SAMPLE_GROUPS': ['Car:3'],
                 'NUM_POINT_FEATURES': 4,
                 'LIMIT_WHOLE_SCENE': True},
                {'NAME': 'random_world_flip', 'PROBABILITY': 0.5,
                 'ALONG_AXIS_LIST': ['x', 'y']},
            ],
        },
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.32, 0.32, 8.0]},
        ],
    })
    runtime = {'MAX_POINTS': 1024, 'MAX_VOXELS': [512], 'MAX_GT': 8}
    ds, loader = build_dataloader(
        cfg, CLASSES, batch_size=2, training=True, runtime_cfg=runtime,
        root_path=str(root), seed=0,
    )
    assert len(ds) == 2  # 4 frames / window 3 → 2 intervals
    batch = next(iter(loader))
    # gt sampling pasted additional Car boxes (LIMIT_WHOLE_SCENE: 3 - 1 existing)
    n_gt = batch['gt_mask'].sum(axis=1)
    assert (n_gt >= 2).all(), n_gt
    assert batch['points'].shape == (2, 1024, 4)
