"""Interactive 3D scene viewer.

Capability parity with the reference's interactive tools
(``tools/visual_utils/open3d_vis_utils.py:38-128`` ``draw_scenes`` /
``draw_scenes_with_2pcs`` and ``visualize_utils.py:142-170``): point cloud +
GT/predicted box wireframes with per-class colors, origin axes, and a
heading-direction tick per box.

Backends, picked automatically:

* **open3d** when importable — a real interactive window with the reference's
  look (black background, point_size 1, per-class ``box_colormap``).
* **matplotlib 3D** otherwise — interactive when a display exists
  (rotate/zoom via the standard mpl 3D controls); falls back to writing a
  PNG under a headless backend (``save_path``), which is also what the unit
  test drives in this display-less image.

Inputs are numpy or jax arrays; boxes are ``[N, 7] (x y z dx dy dz heading)``
with optional trailing columns ignored (the reference slices ``[:, :7]`` the
same way).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# per-class wireframe colors (reference box_colormap, open3d_vis_utils.py:11-16)
BOX_COLORMAP = np.asarray([
    [1.0, 1.0, 1.0],
    [0.0, 1.0, 0.0],
    [0.0, 1.0, 1.0],
    [1.0, 1.0, 0.0],
    [1.0, 0.0, 1.0],
    [0.5, 0.5, 1.0],
])

# the 12 box edges + a heading tick from the front-face center outward
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
          (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def _np(x):
    return np.asarray(x) if x is not None else None


def boxes_to_corners_3d(boxes: np.ndarray) -> np.ndarray:
    """[N, 7] → [N, 8, 3] corners (template order of the reference
    ``visualize_utils.boxes_to_corners_3d``, visualize_utils.py:44-69:
    bottom face 0-3 counter-clockwise, then top face 4-7)."""
    boxes = np.asarray(boxes, np.float64)
    template = np.asarray([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], np.float64) / 2.0
    corners = boxes[:, None, 3:6] * template[None]  # [N, 8, 3]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    out = np.stack([x, y, corners[..., 2]], axis=-1)
    return out + boxes[:, None, 0:3]


def _box_segments(boxes):
    """[N, 7] → list of (2, 3) line segments: 12 edges + heading tick."""
    corners = boxes_to_corners_3d(boxes)
    segs = []
    for n in range(corners.shape[0]):
        cs = corners[n]
        for a, b in _EDGES:
            segs.append((cs[a], cs[b]))
        front = 0.5 * (cs[0] + cs[5])  # front-face diagonal midpoint
        center = cs.mean(axis=0)
        segs.append((center, front + (front - center) * 0.3))
    return segs


def _colors_for(n_boxes, ref_labels):
    if ref_labels is None:
        return [BOX_COLORMAP[1]] * n_boxes
    labels = np.asarray(ref_labels).astype(int) % len(BOX_COLORMAP)
    return [BOX_COLORMAP[l] for l in labels]


def _have_open3d():
    try:
        import open3d  # noqa: F401
        return True
    except Exception:
        return False


def _draw_open3d(points, prev_points, gt_boxes, ref_boxes, ref_labels,
                 ref_scores, point_colors, draw_origin):
    import open3d

    vis = open3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)
    if draw_origin:
        vis.add_geometry(open3d.geometry.TriangleMesh.
                         create_coordinate_frame(size=1.0, origin=[0, 0, 0]))
    pc = open3d.geometry.PointCloud()
    pts = points[:, :3] if prev_points is None else np.vstack(
        [points[:, :3], prev_points[:, :3]])
    pc.points = open3d.utility.Vector3dVector(pts)
    if point_colors is not None:
        pc.colors = open3d.utility.Vector3dVector(point_colors)
    elif prev_points is not None:
        pc.colors = open3d.utility.Vector3dVector(np.vstack([
            np.tile([[0.0, 1.0, 0.0]], (points.shape[0], 1)),
            np.tile([[1.0, 0.0, 0.0]], (prev_points.shape[0], 1)),
        ]))
    vis.add_geometry(pc)

    def add_boxes(boxes, colors):
        for box, color in zip(boxes, colors):
            segs = np.asarray(_box_segments(box[None, :7]))
            ls = open3d.geometry.LineSet()
            ls.points = open3d.utility.Vector3dVector(
                segs.reshape(-1, 3))
            ls.lines = open3d.utility.Vector2iVector(
                np.arange(segs.shape[0] * 2).reshape(-1, 2))
            ls.paint_uniform_color(color)
            vis.add_geometry(ls)

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(gt_boxes, [[0.0, 0.0, 1.0]] * len(gt_boxes))
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(ref_boxes, _colors_for(len(ref_boxes), ref_labels))
    vis.run()
    vis.destroy_window()


def _draw_mpl(points, prev_points, gt_boxes, ref_boxes, ref_labels,
              ref_scores, point_colors, draw_origin, save_path,
              max_points=60000):
    import matplotlib
    if save_path is not None:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Line3DCollection

    fig = plt.figure(figsize=(10, 10), facecolor='black')
    ax = fig.add_subplot(projection='3d', facecolor='black')
    for pts, color in ((points, None), (prev_points, (1.0, 0.2, 0.2, 0.5))):
        if pts is None:
            continue
        if pts.shape[0] > max_points:
            sel = np.random.RandomState(0).choice(
                pts.shape[0], max_points, replace=False)
            pts = pts[sel]
        kw = ({'c': pts[:, 2], 'cmap': 'viridis'} if color is None and
              point_colors is None else
              {'color': color} if color is not None else
              {'c': point_colors})
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.3, **kw)
    if draw_origin:
        for vec, c in (([1, 0, 0], 'r'), ([0, 1, 0], 'g'), ([0, 0, 1], 'b')):
            v = np.asarray(vec, float)
            ax.plot([0, v[0]], [0, v[1]], [0, v[2]], color=c, linewidth=2)

    def add_boxes(boxes, colors):
        segs = _box_segments(np.asarray(boxes)[:, :7])
        per_box = len(_EDGES) + 1
        cols = np.repeat(np.asarray(colors, float), per_box, axis=0)
        ax.add_collection3d(
            Line3DCollection(segs, colors=cols, linewidths=1.0))

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(gt_boxes, [[0.0, 0.3, 1.0]] * len(gt_boxes))
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(ref_boxes, _colors_for(len(ref_boxes), ref_labels))
        if ref_scores is not None:
            for box, s in zip(np.asarray(ref_boxes), np.asarray(ref_scores)):
                ax.text(box[0], box[1], box[2] + box[5], f'{float(s):.2f}',
                        color='white', fontsize=6)
    ax.set_axis_off()
    lim = (max(np.abs(points[:, :2]).max(), 10.0)
           if points.shape[0] else 10.0)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-5, 5)
    if save_path is not None:
        fig.savefig(save_path, dpi=120, facecolor='black')
        plt.close(fig)
        return save_path
    plt.show()
    return None


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True,
                save_path=None):
    """Reference ``open3d_vis_utils.draw_scenes`` equivalent. Interactive
    window when a backend supports it; ``save_path`` renders to PNG instead
    (headless operation)."""
    points = _np(points)
    gt_boxes, ref_boxes = _np(gt_boxes), _np(ref_boxes)
    if save_path is None and _have_open3d():
        _draw_open3d(points, None, gt_boxes, ref_boxes, ref_labels,
                     ref_scores, point_colors, draw_origin)
        return None
    return _draw_mpl(points, None, gt_boxes, ref_boxes, ref_labels,
                     ref_scores, point_colors, draw_origin, save_path)


def draw_scenes_with_2pcs(points, points_prev, gt_boxes=None, ref_boxes=None,
                          ref_labels=None, ref_scores=None, point_colors=None,
                          draw_origin=True, save_path=None):
    """Two-frame variant (open3d_vis_utils.py:84-128): current frame green,
    previous frame red."""
    points, points_prev = _np(points), _np(points_prev)
    gt_boxes, ref_boxes = _np(gt_boxes), _np(ref_boxes)
    if save_path is None and _have_open3d():
        _draw_open3d(points, points_prev, gt_boxes, ref_boxes, ref_labels,
                     ref_scores, point_colors, draw_origin)
        return None
    return _draw_mpl(points, points_prev, gt_boxes, ref_boxes, ref_labels,
                     ref_scores, point_colors, draw_origin, save_path)
