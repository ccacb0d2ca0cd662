"""3D scene export (tools/visual_utils/scene_export.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / 'tools'))

from visual_utils.scene_export import export_scene, _box_corners


def test_box_corners_axis_aligned():
    c = _box_corners([1.0, 2.0, 0.0, 4.0, 2.0, 1.0, 0.0])
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), -1.0)
    np.testing.assert_allclose(c[:, 0].max(), 3.0)
    np.testing.assert_allclose(c[:, 1].min(), 1.0)
    np.testing.assert_allclose(c[:, 2].max(), 0.5)


def test_export_scene(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 4).astype(np.float32)
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]])
    pred = np.array([[1, 1, 0, 4, 2, 1.5, -0.2]])
    files = export_scene(tmp_path, pts, gt, pred)
    assert len(files) == 3
    txt = (tmp_path / 'scene_points.ply').read_text()
    assert txt.startswith('ply') and 'element vertex 100' in txt
    btxt = (tmp_path / 'gt_boxes.ply').read_text()
    assert 'element vertex 8' in btxt and 'element edge 12' in btxt
