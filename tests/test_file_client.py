"""file_client storage abstraction (reference pcdet/utils/file_client.py):
backend registry, typed loaders, and the ONCE reader running through it."""

import numpy as np
import pytest

from tmae_tpu.utils.file_client import (
    BaseStorageBackend, FileClient, register_backend,
)


def test_disk_backend_roundtrip(tmp_path):
    fc = FileClient('disk')
    fc.put(b'hello', tmp_path / 'a' / 'b.bin')
    assert fc.get(tmp_path / 'a' / 'b.bin') == b'hello'
    assert fc.exists(tmp_path / 'a' / 'b.bin')
    assert not fc.exists(tmp_path / 'nope')
    with fc.get_local_path(tmp_path / 'a' / 'b.bin') as p:
        assert open(p, 'rb').read() == b'hello'


def test_typed_loaders(tmp_path):
    import json
    import pickle

    fc = FileClient('disk')
    (tmp_path / 'x.pkl').write_bytes(pickle.dumps({'a': 1}))
    (tmp_path / 'x.json').write_text(json.dumps([1, 2]))
    np.save(tmp_path / 'x.npy', np.arange(6).reshape(2, 3))
    np.arange(4, dtype=np.float32).tofile(tmp_path / 'x.bin')
    assert fc.load_pickle(tmp_path / 'x.pkl') == {'a': 1}
    assert fc.load_json(tmp_path / 'x.json') == [1, 2]
    assert fc.load_npy(tmp_path / 'x.npy').shape == (2, 3)
    np.testing.assert_allclose(fc.load_to_numpy(tmp_path / 'x.bin'),
                               [0, 1, 2, 3])


def test_custom_backend_registry(tmp_path):
    class MemBackend(BaseStorageBackend):
        store = {}

        def get(self, p):
            return self.store[str(p)]

        def get_text(self, p, encoding='utf-8'):
            return self.get(p).decode(encoding)

    register_backend('mem', MemBackend)
    MemBackend.store['k'] = b'v'
    assert FileClient('mem').get('k') == b'v'
    with pytest.raises(KeyError):
        FileClient('s3')


def test_once_reader_through_file_client(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))
    import create_once_infos as coi
    from once_fixture import CLASSES, make_raw_once

    from tmae_tpu.config import Cfg
    from tmae_tpu.datasets.dataset import build_dataloader

    root = make_raw_once(tmp_path)
    coi.create_infos(root, 'val')
    cfg = Cfg.from_dict({
        'DATASET': 'ONCEDataset',
        'POINT_CLOUD_RANGE': [-32.0, -32.0, -5.0, 32.0, 32.0, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'FILE_CLIENT': {'backend': 'disk'},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.32, 0.32, 8.0]},
        ],
    })
    ds, loader = build_dataloader(
        cfg, CLASSES, batch_size=1, training=False,
        runtime_cfg={'MAX_POINTS': 512, 'MAX_VOXELS': [512], 'MAX_GT': 8},
        root_path=str(root), seed=0,
    )
    batch = next(iter(loader))
    assert batch['point_mask'].sum() > 0
