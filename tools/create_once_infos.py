#!/usr/bin/env python
"""ONCE dataset preprocessing: build info pkls and the GT-sampling database.

Counterpart of the reference's ``get_infos`` + ``create_groundtruth_database``
(``pcdet/datasets/once_temporal/once_temporal_dataset.py:342-549``). Reads the raw
ONCE layout (``<root>/data/<seq>/<seq>.json`` + ``lidar_roof/<frame>.bin``),
writes ``once_infos_<split>.pkl`` and, for annotated train splits,
``once_dbinfos_train.pkl`` + per-object point files under ``gt_database/``.

Usage:
  python tools/create_once_infos.py --data_path ../data/once --splits train val
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tmae_tpu.utils import native  # noqa: E402


def _points_in_box_mask(points, box):
    idx = native.points_in_boxes(points[:, :3].astype(np.float32),
                                 box[None, :7].astype(np.float64))
    if idx is not None:
        return idx == 0
    # numpy fallback
    from tmae_tpu.datasets.augmentor import points_in_boxes_mask
    return points_in_boxes_mask(points, box[None, :7])


def load_sequence(root: Path, seq_id: str):
    ann = root / 'data' / seq_id / f'{seq_id}.json'
    with open(ann) as f:
        meta = json.load(f)
    # sequence-level camera calib (ONCE devkit schema: per-cam cam_to_velo
    # 4x4, cam_intrinsic 3x3, distortion), copied into each frame info
    calib = {
        cam: {
            'cam_to_velo': np.asarray(c['cam_to_velo'], np.float32),
            'cam_intrinsic': np.asarray(c['cam_intrinsic'], np.float32),
            'distortion': np.asarray(c.get('distortion', np.zeros(5)),
                                     np.float32),
        }
        for cam, c in meta.get('calib', {}).items()
    }
    infos = []
    for frame in meta.get('frames', []):
        info = {
            'sequence_id': seq_id,
            'frame_id': str(frame['frame_id']),
            'timestamp': frame.get('timestamp', 0),
            'pose': np.asarray(frame.get('pose', np.zeros(7)), np.float64),
        }
        if calib:
            info['calib'] = calib
        if 'annos' in frame:
            annos = frame['annos']
            info['annos'] = {
                'name': np.asarray(annos['names']),
                'boxes_3d': np.asarray(annos['boxes_3d'], np.float32),
            }
        infos.append(info)
    return infos


def create_infos(root: Path, split: str, splits_dir='ImageSets'):
    split_file = root / splits_dir / f'{split}.txt'
    seq_ids = [l.strip() for l in split_file.read_text().splitlines() if l.strip()]
    infos = []
    for seq in seq_ids:
        infos.extend(load_sequence(root, seq))
    # per-frame num_points_in_gt (reference get_infos computes it for train)
    for info in infos:
        if 'annos' not in info:
            continue
        lidar = root / 'data' / info['sequence_id'] / 'lidar_roof' / (
            info['frame_id'] + '.bin')
        if not lidar.exists():
            continue
        points = np.fromfile(lidar, np.float32).reshape(-1, 4)
        npig = np.zeros(len(info['annos']['name']), np.int32)
        for gi, box in enumerate(info['annos']['boxes_3d']):
            npig[gi] = int(_points_in_box_mask(points, box).sum())
        info['annos']['num_points_in_gt'] = npig
    out = root / f'once_infos_{split}.pkl'
    with open(out, 'wb') as f:
        pickle.dump(infos, f)
    print(f'wrote {out} ({len(infos)} frames)')
    return infos


def create_gt_database(root: Path, infos, split='train'):
    """Per-class object point clips, object-centered (the layout our
    DataBaseSampler consumes; reference once_temporal_dataset.py:492-549)."""
    db_dir = root / f'gt_database_{split}'
    db_dir.mkdir(exist_ok=True)
    db_infos: dict = {}
    for info in infos:
        if 'annos' not in info:
            continue
        lidar = root / 'data' / info['sequence_id'] / 'lidar_roof' / (
            info['frame_id'] + '.bin')
        if not lidar.exists():
            continue
        points = np.fromfile(lidar, np.float32).reshape(-1, 4)
        for gi, (name, box) in enumerate(
            zip(info['annos']['name'], info['annos']['boxes_3d'])
        ):
            m = _points_in_box_mask(points, box)
            obj = points[m].copy()
            obj[:, :3] -= box[:3]  # object-centered
            fname = f"{info['frame_id']}_{name}_{gi}.bin"
            obj.tofile(db_dir / fname)
            db_infos.setdefault(str(name), []).append({
                'name': str(name),
                'path': str(Path(db_dir.name) / fname),
                'gt_idx': gi,
                'box3d_lidar': np.asarray(box, np.float32),
                'num_points_in_gt': int(m.sum()),
            })
    out = root / f'once_dbinfos_{split}.pkl'
    with open(out, 'wb') as f:
        pickle.dump(db_infos, f)
    total = sum(len(v) for v in db_infos.values())
    print(f'wrote {out} ({total} objects, {len(db_infos)} classes)')
    return db_infos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_path', required=True)
    parser.add_argument('--splits', nargs='+',
                        default=['train', 'val', 'raw_large'])
    parser.add_argument('--with_gt_database', action='store_true', default=True)
    args = parser.parse_args()
    root = Path(args.data_path)
    for split in args.splits:
        if not (root / 'ImageSets' / f'{split}.txt').exists():
            print(f'skip {split}: no split file')
            continue
        infos = create_infos(root, split)
        if split == 'train' and args.with_gt_database:
            create_gt_database(root, infos, split)


if __name__ == '__main__':
    main()
