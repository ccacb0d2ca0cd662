"""Raw-ONCE-format disk fixture shared by the info-creation, camera-pipeline,
and overfit tests: ``data/<seq>/<seq>.json`` (frames + calib) +
``lidar_roof/<frame>.bin`` + ``<cam>/<frame>.jpg`` + ImageSets splits — the
exact layout the reference's devkit consumes."""

import json
from pathlib import Path

import numpy as np

CLASSES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']
CAM = 'cam03'


def make_raw_once(root: Path, n_frames=4, with_camera=False, img_hw=(64, 96)):
    rng = np.random.RandomState(0)
    seq = '000000'
    seq_dir = root / 'data' / seq
    (seq_dir / 'lidar_roof').mkdir(parents=True)
    (root / 'ImageSets').mkdir()
    if with_camera:
        (seq_dir / CAM).mkdir()
    frames = []
    for fi in range(n_frames):
        frame_id = f'{1000 + fi}'
        n = 400
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0:2] = rng.uniform(-30, 30, (n, 2))
        pts[:, 2] = rng.uniform(-1.5, 0.5, n)
        pts[:, 3] = rng.uniform(0, 1, n)
        # distinct per-frame positions on a 12 m circle: bounded for any
        # frame count, and non-overlapping so gt-sampler collision checks
        # don't reject pasted objects
        box = np.array([12.0 * np.cos(fi * 2.4), 12.0 * np.sin(fi * 2.4),
                        -0.5, 4.0, 2.0, 1.6, 0.3], np.float32)
        # put 30 points inside the box so it survives min-point filters
        inside = np.zeros((30, 4), np.float32)
        inside[:, 0:3] = box[:3] + rng.uniform(-0.5, 0.5, (30, 3))
        inside[:, 3] = 0.5
        pts = np.vstack([pts, inside])
        pts.tofile(seq_dir / 'lidar_roof' / f'{frame_id}.bin')
        if with_camera:
            from PIL import Image

            h, w = img_hw
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(seq_dir / CAM / f'{frame_id}.jpg')
        frames.append({
            'frame_id': frame_id,
            'pose': [0, 0, 0, 1, 0.5 * fi, 0, 0],
            'annos': {
                'names': ['Car'],
                'boxes_3d': [box.tolist()],
            },
        })
    meta = {'frames': frames}
    if with_camera:
        # camera looks along +x of the lidar frame (ONCE cam_to_velo schema)
        h, w = img_hw
        # columns = camera axes (x right, y down, z forward) in lidar frame
        cam_to_velo = np.eye(4)
        cam_to_velo[:3, :3] = np.array(
            [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
        K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
        meta['calib'] = {CAM: {
            'cam_to_velo': cam_to_velo.tolist(),
            'cam_intrinsic': K.tolist(),
            'distortion': [0.0] * 5,
        }}
    with open(seq_dir / f'{seq}.json', 'w') as f:
        json.dump(meta, f)
    (root / 'ImageSets' / 'train.txt').write_text(seq + '\n')
    (root / 'ImageSets' / 'val.txt').write_text(seq + '\n')
    return root
