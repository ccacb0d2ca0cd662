#!/usr/bin/env python
"""3D scene visualization (reference ``tools/visual_utils/open3d_vis_utils.py``
+ ``visualize_utils.py``): point cloud + gt/pred boxes.

open3d isn't in this image, so the primary path EXPORTS standard mesh files —
``scene_points.ply`` (colored point cloud) and ``boxes.ply`` (box wireframes
as edges) — that open3d/MeshLab/CloudCompare open directly; when open3d IS
importable, ``draw_scenes`` pops the same interactive viewer as the reference.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _box_corners(box7):
    x, y, z, dx, dy, dz, yaw = [float(v) for v in box7[:7]]
    c, s = np.cos(yaw), np.sin(yaw)
    sx = np.array([-1, 1, 1, -1, -1, 1, 1, -1]) * dx / 2
    sy = np.array([-1, -1, 1, 1, -1, -1, 1, 1]) * dy / 2
    sz = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * dz / 2
    px = sx * c - sy * s + x
    py = sx * s + sy * c + y
    return np.stack([px, py, sz + z], axis=1)  # [8, 3]


_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def write_points_ply(path, points, colors=None):
    """ASCII PLY point cloud. points [N, >=3]; colors [N, 3] uint8 or None
    (intensity-colored if a 4th channel exists)."""
    pts = np.asarray(points)
    if colors is None:
        if pts.shape[1] > 3:
            it = pts[:, 3]
            t = (it - it.min()) / max(float(it.max() - it.min()), 1e-6)
            colors = np.stack([255 * t, 255 * (1 - t), np.full_like(t, 80)],
                              axis=1).astype(np.uint8)
        else:
            colors = np.full((len(pts), 3), 200, np.uint8)
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(pts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'property uchar red\nproperty uchar green\nproperty uchar blue\n'
                'end_header\n')
        for p, c in zip(pts, colors):
            f.write(f'{p[0]:.3f} {p[1]:.3f} {p[2]:.3f} '
                    f'{int(c[0])} {int(c[1])} {int(c[2])}\n')
    return Path(path)


def write_boxes_ply(path, boxes, color=(0, 255, 0)):
    """Box wireframes as a PLY edge set. boxes [M, 7]."""
    boxes = np.asarray(boxes).reshape(-1, 7)
    verts, edges = [], []
    for b in boxes:
        base = len(verts)
        verts.extend(_box_corners(b))
        edges.extend([(base + i, base + j) for i, j in _EDGES])
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n'
                f'element vertex {len(verts)}\n'
                'property float x\nproperty float y\nproperty float z\n'
                'property uchar red\nproperty uchar green\nproperty uchar blue\n'
                f'element edge {len(edges)}\n'
                'property int vertex1\nproperty int vertex2\n'
                'end_header\n')
        for v in verts:
            f.write(f'{v[0]:.3f} {v[1]:.3f} {v[2]:.3f} '
                    f'{color[0]} {color[1]} {color[2]}\n')
        for a, b in edges:
            f.write(f'{a} {b}\n')
    return Path(path)


def export_scene(out_dir, points, gt_boxes=None, pred_boxes=None):
    """Reference ``draw_scenes`` as files: scene_points.ply + gt_boxes.ply
    (blue) + pred_boxes.ply (green)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = [write_points_ply(out / 'scene_points.ply', points)]
    if gt_boxes is not None and len(gt_boxes):
        files.append(write_boxes_ply(out / 'gt_boxes.ply', gt_boxes,
                                     (0, 0, 255)))
    if pred_boxes is not None and len(pred_boxes):
        files.append(write_boxes_ply(out / 'pred_boxes.ply', pred_boxes,
                                     (0, 255, 0)))
    return files


def draw_scenes(points, gt_boxes=None, ref_boxes=None, **_):
    """Interactive viewer when open3d is available (reference
    open3d_vis_utils.draw_scenes signature); otherwise exports to ./viz/."""
    try:
        import open3d as o3d
    except ImportError:
        files = export_scene('viz', points, gt_boxes, ref_boxes)
        print('open3d not installed; exported', [str(f) for f in files])
        return
    geoms = []
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points)[:, :3])
    geoms.append(pc)
    for boxes, color in ((gt_boxes, (0, 0, 1)), (ref_boxes, (0, 1, 0))):
        if boxes is None:
            continue
        for b in np.asarray(boxes).reshape(-1, 7):
            ls = o3d.geometry.LineSet()
            ls.points = o3d.utility.Vector3dVector(_box_corners(b))
            ls.lines = o3d.utility.Vector2iVector(np.asarray(_EDGES))
            ls.paint_uniform_color(color)
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)
