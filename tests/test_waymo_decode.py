"""Native Waymo TFRecord decode (tmae_tpu/datasets/waymo_decode.py): TFRecord
container round-trip with valid crc32c, Frame wire-format codec round-trip,
range-image → point-cloud geometry self-consistency, and the full
create_waymo_infos chain from a SELF-BUILT TFRecord to a loaded
WaymoTemporalDataset batch (VERDICT r3 #8) — all without tensorflow or
waymo_open_dataset."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from tmae_tpu.datasets import waymo_decode as wd


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert wd.crc32c(b'') == 0x0
    assert wd.crc32c(b'123456789') == 0xE3069283
    assert wd.crc32c(bytes(32)) == 0x8A9136AA


def test_tfrecord_roundtrip(tmp_path):
    payloads = [b'hello', b'', bytes(range(256)) * 7]
    p = tmp_path / 'x.tfrecord'
    wd.write_tfrecord(p, payloads)
    got = list(wd.read_tfrecord(p, verify_crc=True))
    assert got == payloads


def _calib(extr=None, lo=-0.3, hi=0.2, beams=()):
    return wd.LaserCalibration(
        name=1, beam_inclinations=list(beams), beam_inclination_min=lo,
        beam_inclination_max=hi,
        extrinsic=np.eye(4) if extr is None else extr)


def test_range_image_geometry_self_consistent():
    """Decode, then re-project each point to (incl, azimuth, range) and check
    it matches its source cell — validates the spherical convention (row 0 =
    highest beam, col 0 = azimuth just under +pi, half-pixel offsets)."""
    rng = np.random.RandomState(0)
    H, W = 8, 32
    ri = np.zeros((H, W, 4), np.float32)
    mask = rng.rand(H, W) < 0.5
    ri[..., 0] = np.where(mask, rng.uniform(2, 60, (H, W)), -1.0)
    ri[..., 1] = rng.rand(H, W)
    calib = _calib(lo=-0.3, hi=0.25)
    pts = wd.range_image_to_points(ri, calib)
    assert len(pts) == mask.sum()
    incl_rows = np.linspace(-0.3, 0.25, H)[::-1]
    ratios = (np.arange(W, 0, -1) - 0.5) / W
    az_cols = (ratios * 2 - 1) * np.pi
    k = 0
    for r in range(H):
        for c in range(W):
            if not mask[r, c]:
                continue
            x, y, z = pts[k, :3].astype(np.float64)
            rr = np.sqrt(x * x + y * y + z * z)
            assert abs(rr - ri[r, c, 0]) < 1e-3
            assert abs(np.arcsin(z / rr) - incl_rows[r]) < 1e-4
            assert abs(np.arctan2(y, x) - az_cols[c]) < 1e-4
            assert abs(pts[k, 3] - ri[r, c, 1]) < 1e-6  # intensity channel
            k += 1


def test_range_image_extrinsic_and_pixel_pose():
    """Extrinsic translation moves points; an identity pixel pose with the
    frame pose equal to identity leaves them unchanged."""
    H, W = 4, 16
    ri = np.zeros((H, W, 4), np.float32)
    ri[..., 0] = 10.0
    extr = np.eye(4)
    extr[:3, 3] = [1.0, -2.0, 0.5]
    base = wd.range_image_to_points(ri, _calib())
    moved = wd.range_image_to_points(ri, _calib(extr=extr))
    np.testing.assert_allclose(moved[:, :3] - base[:, :3],
                               np.tile([1.0, -2.0, 0.5], (len(base), 1)),
                               atol=1e-6)
    pp = np.zeros((H, W, 6), np.float32)
    same = wd.range_image_to_points(ri, _calib(), pixel_pose=pp,
                                    frame_pose=np.eye(4))
    np.testing.assert_allclose(same[:, :3], base[:, :3], atol=1e-6)
    # a pure-yaw pixel pose rotates each point about z
    pp2 = pp.copy()
    pp2[..., 2] = np.pi / 2
    rot = wd.range_image_to_points(ri, _calib(), pixel_pose=pp2,
                                   frame_pose=np.eye(4))
    np.testing.assert_allclose(rot[:, 0], -base[:, 1], atol=1e-5)
    np.testing.assert_allclose(rot[:, 1], base[:, 0], atol=1e-5)


def _synth_frame_bytes(fi, rng):
    """One Frame proto: a 16x64 lidar sweep + one Vehicle label."""
    H, W = 16, 64
    ri = np.zeros((H, W, 4), np.float32)
    keep = rng.rand(H, W) < 0.7
    ri[..., 0] = np.where(keep, rng.uniform(2.0, 24.0, (H, W)), -1.0)
    ri[..., 1] = rng.rand(H, W)
    ri[..., 2] = rng.rand(H, W) * 0.1
    ri[..., 3] = -1.0  # outside NLZ
    pose = np.eye(4)
    pose[:3, 3] = [0.5 * fi, 0.0, 0.0]
    box = [5.0, 1.0 * fi, 0.5, 4.5, 2.0, 1.6, 0.2]  # cx cy cz l w h heading
    return wd.encode_frame(
        context_name='ctx_tfr', timestamp_micros=1000 + fi, pose=pose,
        lasers={1: (ri, None)},
        calibrations={1: (np.eye(4), -0.3, 0.1, ())},
        labels=[(box, 1)],
    )


def test_frame_codec_roundtrip():
    rng = np.random.RandomState(3)
    raw = _synth_frame_bytes(2, rng)
    fr = wd.Frame.parse(raw)
    assert fr.context_name == 'ctx_tfr'
    assert fr.timestamp_micros == 1002
    assert fr.pose[0, 3] == 1.0
    assert 1 in fr.range_images and 1 in fr.laser_calibrations
    assert fr.range_images[1].range_image.shape == (16, 64, 4)
    (box, typ), = fr.labels
    assert typ == 1
    np.testing.assert_allclose(box, [5.0, 2.0, 0.5, 4.5, 2.0, 1.6, 0.2])
    d = wd.decode_frame(fr)
    assert d['points'].shape[1] == 6
    assert (d['points'][:, 5] == -1.0).all()
    assert d['annos']['name'][0] == 'Vehicle'


def test_tfrecord_to_dataset_end_to_end(tmp_path):
    """The VERDICT r3 #8 chain: synthesize a real TFRecord → native decode via
    create_waymo_infos.decode_tfrecord_sequence → sequence artifacts → a
    WaymoTemporalDataset batch."""
    import create_waymo_infos as cwi
    from tmae_tpu.config import Cfg
    from tmae_tpu.datasets.dataset import build_dataloader

    rng = np.random.RandomState(0)
    root = tmp_path
    raw = root / 'raw'
    raw.mkdir()
    wd.write_tfrecord(raw / 'seq_tfr.tfrecord',
                      [_synth_frame_bytes(i, rng) for i in range(3)])

    frames = cwi.decode_tfrecord_sequence(raw / 'seq_tfr.tfrecord')
    assert len(frames) == 3
    assert frames[0]['points'].shape[1] == 6
    assert frames[0]['annos']['gt_boxes_lidar'].shape == (1, 7)

    data = root / 'waymo_processed_data'
    (root / 'ImageSets').mkdir()
    (root / 'ImageSets' / 'val.txt').write_text('seq_tfr\n')
    infos = cwi.build_sequence_artifacts(frames, 'seq_tfr', data)
    assert (data / 'seq_tfr' / 'seq_tfr.pkl').exists()

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
    runtime = {'MAX_POINTS': 2048, 'MAX_VOXELS': [512], 'MAX_GT': 8}
    ds, loader = build_dataloader(
        cfg, ['Vehicle', 'Pedestrian', 'Cyclist'], batch_size=1,
        training=False, runtime_cfg=runtime, root_path=str(root), seed=0,
    )
    assert len(ds) >= 1
    batch = next(iter(loader))
    assert batch['point_mask'].sum() > 0
    assert batch['points_prev'] is not None
