"""ONCE temporal (two-frame) dataset + a synthetic stand-in for tests/benchmarks.

Host-side re-implementation of ``pcdet/datasets/once_temporal/once_temporal_
dataset.py``: per-sequence SCAN_WINDOW intervals, random/fixed previous-frame gap,
ego-point removal, quaternion-pose ego-motion compensation of the previous frame
into current coordinates (``once_eval/once_utils.py:4-29``), and the ONCE AP
evaluation adapter.
"""

from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate, register_dataset
from .once_eval import get_evaluation_results


def quat_to_matrix(q):
    """[x, y, z, w] quaternion → 3x3 rotation matrix (scipy convention used by the
    reference's ``Rotation.from_quat``)."""
    x, y, z, w = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def convert_prv_frame_to_cur(pc_prv, pose_prv, pose_cur):
    """Ego-motion compensation (once_utils.py:4-29). Poses: [qx,qy,qz,qw,tx,ty,tz];
    all-zero pose means static → skip."""
    if not np.any(pose_prv):
        pc_global = pc_prv[:, :3]
    else:
        R = quat_to_matrix(pose_prv[:4])
        t = np.asarray(pose_prv[4:], np.float64)
        pc_global = pc_prv[:, :3] @ R.T + t
    if np.any(pose_cur):
        T = np.zeros((4, 4))
        T[:3, :3] = quat_to_matrix(pose_cur[:4])
        T[:3, 3] = np.asarray(pose_cur[4:], np.float64)
        T[3, 3] = 1
        Tinv = np.linalg.inv(T)
        ones = np.ones((len(pc_global), 1))
        pc_global = (np.hstack([pc_global, ones]) @ Tinv.T)[:, :3]
    return np.concatenate(
        [pc_global.astype(pc_prv.dtype), pc_prv[:, 3:]], axis=-1
    )


def remove_ego_points(points, center_radius=1.0):
    m = ~(
        (np.abs(points[:, 0]) < center_radius)
        & (np.abs(points[:, 1]) < center_radius)
    )
    return points[m]


def generate_intervals(frame_counts, scan_window):
    """Per-sequence [start, end) intervals of length scan_window
    (dataset.py:241-252 / once_temporal_dataset.py:87-94)."""
    intervals = []
    offset = 0
    for n in frame_counts:
        s = 0
        while s < n:
            e = min(s + scan_window, n)
            intervals.append((offset + s, offset + e))
            s = e
        offset += n
    return intervals


@register_dataset('ONCETemporalDataset')
class ONCETemporalDataset(DatasetTemplate):
    """Two-frame ONCE loader over real info pkls (data layout identical to the
    reference: ``<root>/<split>.pkl`` infos with per-frame ``frame_id``,
    ``sequence_id``, ``pose``, optional ``annos``; lidar at
    ``<root>/data/<seq>/lidar_roof/<frame>.bin``)."""

    def __init__(self, dataset_cfg, class_names, training, root_path=None,
                 runtime_cfg=None, seed=None):
        super().__init__(dataset_cfg, class_names, training, root_path,
                         runtime_cfg, seed)
        from ..utils.file_client import FileClient

        fc_cfg = dict(dataset_cfg.get('FILE_CLIENT', {'backend': 'disk'}))
        self.file_client = FileClient(**fc_cfg)
        self.split = dataset_cfg['DATA_SPLIT']['train' if training else 'test']
        self.scan_window = int(dataset_cfg.get('SCAN_WINDOW', 3))
        self.align_two_frames = bool(dataset_cfg.get('ALIGN_TWO_FRAMES', True))
        self.fixed_gap = int(dataset_cfg.get('FIXED_GAP', -1))
        self.sampling_window = max(self.scan_window // 3, 1)
        self.root = Path(root_path) if root_path else None
        self.once_infos = []
        self._load_infos()
        counts = []
        cur_seq, cnt = None, 0
        for info in self.once_infos:
            if info['sequence_id'] != cur_seq:
                if cur_seq is not None:
                    counts.append(cnt)
                cur_seq, cnt = info['sequence_id'], 0
            cnt += 1
        if cur_seq is not None:
            counts.append(cnt)
        self.once_intervals = generate_intervals(counts, self.scan_window)

    def _load_infos(self):
        info_path = None
        if self.root is not None:
            for cand in (self.root / f'once_infos_{self.split}.pkl',
                         self.root / f'{self.split}.pkl'):
                if cand.exists():
                    info_path = cand
                    break
        if info_path is None:
            return
        self.once_infos = self.file_client.load_pickle(info_path)

    def get_lidar(self, seq_id, frame_id):
        path = self.root / 'data' / seq_id / 'lidar_roof' / f'{frame_id}.bin'
        return self.file_client.load_to_numpy(path).reshape(-1, 4)

    def get_image(self, seq_id, frame_id, cam_name):
        """ONCE camera frame (<root>/data/<seq>/<cam>/<frame>.jpg) as uint8
        BGR (the cv2 channel convention the image processors assume)."""
        import io

        from PIL import Image

        path = self.root / 'data' / seq_id / cam_name / f'{frame_id}.jpg'
        with io.BytesIO(self.file_client.get(path)) as f:
            img = np.asarray(Image.open(f).convert('RGB'))[..., ::-1]
        return np.ascontiguousarray(img)

    def _attach_camera(self, data, info):
        """Image + calib for the configured camera (dataset CAMERA_CONFIG:
        {USE_CAMERA, CAM_NAME}). ONCE info calib: cam_to_velo 4x4,
        cam_intrinsic 3x3 (ONCE devkit schema)."""
        cam_cfg = self.dataset_cfg.get('CAMERA_CONFIG')
        if not cam_cfg or not cam_cfg.get('USE_CAMERA', True):
            return data
        cam = cam_cfg.get('CAM_NAME', 'cam03')
        data['image'] = self.get_image(
            info['sequence_id'], info['frame_id'], cam
        ).astype(np.float32)
        calib = info['calib'][cam]
        c2v = np.asarray(calib['cam_to_velo'], np.float32)
        data['trans_lidar_to_cam'] = np.linalg.inv(c2v).astype(np.float32)
        K = np.asarray(calib['cam_intrinsic'], np.float32)
        data['trans_cam_to_img'] = np.concatenate(
            [K, np.zeros((3, 1), np.float32)], axis=1)
        return data

    def __len__(self):
        return len(self.once_intervals)

    def __getitem__(self, index):
        itv = self.once_intervals[index]
        idx = itv[1] - 1
        num_frames = itv[1] - itv[0]
        if self.fixed_gap == -1:
            if num_frames == 1:
                idx_prev = idx
            else:
                idx_prev = int(self.rng.randint(
                    itv[0], itv[0] + self.sampling_window
                ))
        else:
            idx_prev = max(itv[0], idx - self.fixed_gap)

        info = copy.deepcopy(self.once_infos[idx])
        info_prev = copy.deepcopy(self.once_infos[idx_prev])
        points = remove_ego_points(
            self.get_lidar(info['sequence_id'], info['frame_id']), 2
        )
        points_prev = remove_ego_points(
            self.get_lidar(info['sequence_id'], info_prev['frame_id']), 2
        )
        if self.align_two_frames and info['frame_id'] != info_prev['frame_id']:
            try:
                points_prev = convert_prv_frame_to_cur(
                    points_prev, info_prev['pose'], info['pose']
                )
            except (ValueError, np.linalg.LinAlgError):
                return self[int(self.rng.randint(len(self)))]

        data = {
            'points': points,
            'points_prev': points_prev,
            'frame_id': info['frame_id'],
        }
        data = self._attach_camera(data, info)
        if 'annos' in info:
            data['gt_names'] = np.asarray(info['annos']['name'])
            data['gt_boxes'] = np.asarray(info['annos']['boxes_3d'], np.float32)
        out = self.prepare_data(data)
        if out is None:
            return self[int(self.rng.randint(len(self)))]
        return out

    def evaluation(self, det_annos, class_names, **kwargs):
        gt_annos = [
            copy.deepcopy(self.once_infos[itv[1] - 1]['annos'])
            for itv in self.once_intervals
        ]
        return get_evaluation_results(gt_annos, det_annos, class_names)

    @staticmethod
    def generate_prediction_dicts(frame_ids, boxes, scores, labels, valid,
                                  class_names):
        """Device outputs → ONCE annos (once_temporal_dataset.py:551-585)."""
        annos = []
        cn = np.asarray(class_names)
        for b in range(len(frame_ids)):
            v = np.asarray(valid[b])
            bx = np.asarray(boxes[b])[v]
            sc = np.asarray(scores[b])[v]
            lb = np.asarray(labels[b])[v].astype(np.int64)
            annos.append({
                'frame_id': frame_ids[b],
                'name': cn[np.clip(lb - 1, 0, len(cn) - 1)]
                if len(bx) else np.zeros(0, cn.dtype),
                'score': sc,
                'boxes_3d': bx[:, :7],
            })
        return annos


@register_dataset('SyntheticONCEDataset')
class SyntheticONCEDataset(ONCETemporalDataset):
    """Procedurally generated ONCE-format scenes (boxes + ground + clutter, two
    ego-motion-consistent frames) for tests and benchmarks — the reference has no
    offline-data-free path; this enables e2e train/eval without the 2 TB dataset."""

    def __init__(self, dataset_cfg, class_names, training, root_path=None,
                 runtime_cfg=None, seed=None):
        self.num_samples = int(dataset_cfg.get('NUM_SYNTHETIC_SAMPLES', 16))
        self.points_per_frame = int(dataset_cfg.get('SYNTHETIC_POINTS', 4096))
        self.boxes_per_frame = int(dataset_cfg.get('SYNTHETIC_BOXES', 8))
        # 'uniform' = fast box+ground+uniform-clutter scenes (tests);
        # 'lidar' = ray-cast 40-beam spinning LiDAR (ONCE sensor class) with
        # ground rings + occlusion shadows — matches the real data's spatial
        # sparsity (~40-60% occupied 8x8 BEV windows vs ~97% for uniform),
        # which the occupied-window compaction path exploits. Benchmarks use
        # this mode so the perf number reflects real-data window occupancy.
        self.synthetic_mode = str(dataset_cfg.get('SYNTHETIC_MODE', 'uniform'))
        # lidar-mode azimuthal density multiplier (bench sensitivity sweeps)
        self.synthetic_density = float(
            dataset_cfg.get('SYNTHETIC_DENSITY', 1.0))
        self._frame_cache = {}
        DatasetTemplate.__init__(self, dataset_cfg, class_names, training,
                                 root_path, runtime_cfg, seed)
        self.scan_window = int(dataset_cfg.get('SCAN_WINDOW', 3))
        self.fixed_gap = int(dataset_cfg.get('FIXED_GAP', -1))
        self.once_intervals = [(i, i + 1) for i in range(self.num_samples)]
        self.once_infos = [
            {'frame_id': f'synth_{i:06d}', 'sequence_id': 'synth',
             'pose': np.zeros(7)}
            for i in range(self.num_samples)
        ]
        self._annos_cache = {}

    def _scene(self, index):
        if index in self._annos_cache:
            return self._annos_cache[index]
        rng = np.random.RandomState(1000 + index)
        pc = self.pc_range
        n_box = self.boxes_per_frame
        boxes = np.zeros((n_box, 7), np.float32)
        names = []
        dims_by_class = {
            'Car': (4.5, 1.9, 1.6), 'Bus': (11.0, 2.9, 3.2),
            'Truck': (8.0, 2.6, 3.0), 'Pedestrian': (0.7, 0.7, 1.7),
            'Cyclist': (1.8, 0.7, 1.7),
        }
        margin = 6.0
        for i in range(n_box):
            cls = self.class_names[rng.randint(len(self.class_names))]
            d = dims_by_class.get(cls, (4.0, 2.0, 1.6))
            boxes[i] = [
                rng.uniform(pc[0] + margin, pc[3] - margin),
                rng.uniform(pc[1] + margin, pc[4] - margin),
                rng.uniform(-1.0, 0.5),
                d[0] * rng.uniform(0.9, 1.1),
                d[1] * rng.uniform(0.9, 1.1),
                d[2] * rng.uniform(0.9, 1.1),
                rng.uniform(-np.pi, np.pi),
            ]
            names.append(cls)
        # unlabeled scene content for the lidar mode (uniform mode: unused):
        # building-like occluders at 15-70 m plus bush/car/pole-scale clutter
        n_bld, n_clutter = 14, 150
        occl = np.zeros((n_bld + n_clutter, 7), np.float32)
        for i in range(n_bld):
            ang = rng.uniform(-np.pi, np.pi)
            r = rng.uniform(15.0, 70.0)
            occl[i] = [
                r * np.cos(ang), r * np.sin(ang), rng.uniform(1.0, 3.0),
                rng.uniform(5.0, 25.0), rng.uniform(3.0, 12.0),
                rng.uniform(4.0, 10.0), rng.uniform(-np.pi, np.pi),
            ]
        for i in range(n_bld, n_bld + n_clutter):
            ang = rng.uniform(-np.pi, np.pi)
            r = rng.uniform(5.0, 72.0)
            occl[i] = [
                r * np.cos(ang), r * np.sin(ang), rng.uniform(-1.5, 0.0),
                rng.uniform(0.5, 4.0), rng.uniform(0.5, 3.0),
                rng.uniform(0.5, 2.5), rng.uniform(-np.pi, np.pi),
            ]
        scene = {'boxes': boxes, 'names': np.asarray(names), 'rng_seed': index,
                 'occluders': occl}
        self._annos_cache[index] = scene
        return scene

    def _render_frame_lidar(self, scene, rng):
        """Ray-cast a 40-beam spinning LiDAR (ONCE sensor class: 40 beams,
        -25..+15 deg elevation, ~0.25 deg azimuth step, sensor at z=0 which is
        ~1.9 m above ground). Rays hit the nearest of {ground plane, gt boxes,
        random building-like occluder cuboids}; misses (sky) return nothing.
        Produces the concentric ground rings, object faces, and occlusion
        shadows that give real LiDAR BEV grids their characteristic sparsity."""
        boxes = scene['boxes']
        occluders = scene['occluders']
        pc = self.pc_range
        n_beams = 40
        elev = np.deg2rad(np.linspace(-25.0, 15.0, n_beams))
        n_az = int(2048 * self.synthetic_density)
        az = np.deg2rad(
            np.arange(n_az) * (360.0 / n_az) + rng.uniform(0, 0.25)
        )
        ce, se = np.cos(elev), np.sin(elev)
        ca, sa = np.cos(az), np.sin(az)
        # direction grid [E, A, 3]
        dx = ce[:, None] * ca[None, :]
        dy = ce[:, None] * sa[None, :]
        dz = np.broadcast_to(se[:, None], dx.shape)
        t_best = np.full(dx.shape, np.inf, np.float32)
        # ground z = zg + roughness: per-ray height noise spreads each ring
        # into a radial band at grazing incidence (band width ~ sigma/tan(el)),
        # which is what fills real BEV grids between the ideal ring circles
        zg = -1.9 + rng.uniform(-0.05, 0.05)
        zray = zg + rng.normal(0, 0.10, dx.shape)
        with np.errstate(divide='ignore'):
            t_g = np.where(dz < -1e-6, zray / dz, np.inf)
        t_best = np.minimum(t_best, t_g)
        # cuboid hits (gt boxes + occluders), slab method in the box frame
        for b in np.concatenate([boxes, occluders], axis=0):
            c, s = np.cos(b[6]), np.sin(b[6])
            # ray origin is (0,0,0); box center/extent
            ox = -(b[0] * c + b[1] * s)
            oy = -(-b[0] * s + b[1] * c)
            oz = -b[2]
            rdx = dx * c + dy * s
            rdy = -dx * s + dy * c
            tmin = np.full(dx.shape, 0.0, np.float32)
            tmax = np.full(dx.shape, np.inf, np.float32)
            for o, d, half in ((ox, rdx, b[3] / 2), (oy, rdy, b[4] / 2),
                               (oz, dz, b[5] / 2)):
                with np.errstate(divide='ignore', invalid='ignore'):
                    inv = 1.0 / d
                t1 = (-half - o) * inv
                t2 = (half - o) * inv
                lo, hi = np.minimum(t1, t2), np.maximum(t1, t2)
                par_in = np.abs(d) < 1e-8
                inside = np.abs(o) <= half
                lo = np.where(par_in, np.where(inside, 0.0, np.inf), lo)
                hi = np.where(par_in, np.where(inside, np.inf, -np.inf), hi)
                tmin = np.maximum(tmin, lo)
                tmax = np.minimum(tmax, hi)
            t_hit = np.where((tmax >= tmin) & (tmin > 0.5), tmin, np.inf)
            t_best = np.minimum(t_best, t_hit)
        r_max = float(max(pc[3], pc[4])) * 1.5
        hit = np.isfinite(t_best) & (t_best < r_max)
        t = (t_best + rng.normal(0, 0.02, t_best.shape))[hit]
        px = (dx[hit] * t).astype(np.float32)
        py = (dy[hit] * t).astype(np.float32)
        pz = (dz[hit] * t).astype(np.float32)
        inten = rng.uniform(0, 1, len(px)).astype(np.float32)
        pts = np.stack([px, py, pz, inten], -1)
        n = self.points_per_frame
        if len(pts) > n:
            pts = pts[rng.choice(len(pts), n, replace=False)]
        return pts.astype(np.float32)

    def _render_frame(self, scene, jitter_rng):
        """Points on box surfaces + ground plane + clutter."""
        if self.synthetic_mode == 'lidar':
            return self._render_frame_lidar(scene, jitter_rng)
        boxes = scene['boxes']
        pts = []
        n_obj = self.points_per_frame // 2 // max(len(boxes), 1)
        for b in boxes:
            local = jitter_rng.uniform(-0.5, 0.5, (n_obj, 3)) * b[3:6]
            c, s = np.cos(b[6]), np.sin(b[6])
            x = local[:, 0] * c - local[:, 1] * s + b[0]
            y = local[:, 0] * s + local[:, 1] * c + b[1]
            z = local[:, 2] + b[2]
            inten = jitter_rng.uniform(0, 1, n_obj)
            pts.append(np.stack([x, y, z, inten], -1))
        n_bg = self.points_per_frame - sum(len(p) for p in pts)
        pc = self.pc_range
        bg = np.stack([
            jitter_rng.uniform(pc[0], pc[3], n_bg),
            jitter_rng.uniform(pc[1], pc[4], n_bg),
            jitter_rng.uniform(-1.8, -1.6, n_bg),
            jitter_rng.uniform(0, 1, n_bg),
        ], -1)
        pts.append(bg)
        return np.concatenate(pts, 0).astype(np.float32)

    def __len__(self):
        return self.num_samples

    def _frame(self, index, which):
        key = (index, which)
        if key not in self._frame_cache:
            scene = self._scene(index)
            rng = np.random.RandomState(
                (2000 if which == 'cur' else 3000) + index)
            self._frame_cache[key] = self._render_frame(scene, rng)
        return self._frame_cache[key]

    def __getitem__(self, index):
        scene = self._scene(index)
        data = {
            'points': self._frame(index, 'cur').copy(),
            'points_prev': self._frame(index, 'prv').copy(),
            'frame_id': f'synth_{index:06d}',
            'gt_names': scene['names'].copy(),
            'gt_boxes': scene['boxes'].copy(),
        }
        out = self.prepare_data(data)
        if out is None:
            return self[(index + 1) % len(self)]
        return out

    def evaluation(self, det_annos, class_names, **kwargs):
        gt_annos = []
        for i in range(self.num_samples):
            scene = self._scene(i)
            gt_annos.append({
                'name': scene['names'], 'boxes_3d': scene['boxes'][:, :7],
            })
        return get_evaluation_results(gt_annos, det_annos, class_names)
