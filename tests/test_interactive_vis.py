"""Headless drive of the interactive 3D viewer (matplotlib backend)."""

import numpy as np


def test_draw_scenes_headless(tmp_path):
    from tools.visual_utils.interactive_vis import (
        boxes_to_corners_3d, draw_scenes, draw_scenes_with_2pcs,
    )

    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (5000, 4)).astype(np.float32)
    prv = rng.uniform(-20, 20, (4000, 4)).astype(np.float32)
    gt = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]], np.float32)
    pred = np.array([[1.1, 2.1, 0.0, 4.1, 2.0, 1.5, 0.25],
                     [-5.0, 3.0, 0.0, 0.8, 0.8, 1.7, 1.2]], np.float32)

    out = draw_scenes(pts, gt_boxes=gt, ref_boxes=pred,
                      ref_labels=np.array([1, 4]),
                      ref_scores=np.array([0.9, 0.4]),
                      save_path=str(tmp_path / 'scene.png'))
    assert (tmp_path / 'scene.png').stat().st_size > 10000

    out2 = draw_scenes_with_2pcs(pts, prv, gt_boxes=gt, ref_boxes=pred,
                                 save_path=str(tmp_path / 'scene2.png'))
    assert (tmp_path / 'scene2.png').stat().st_size > 10000
    assert out and out2


def test_corners_match_geometry_np_bev():
    """3D corners' bottom face projects to the BEV corners used everywhere
    else (ops/geometry_np.boxes_to_corners_bev) — same template order."""
    from tmae_tpu.ops.geometry_np import boxes_to_corners_bev
    from tools.visual_utils.interactive_vis import boxes_to_corners_3d

    boxes = np.array([[1.0, -2.0, 0.5, 4.0, 2.0, 1.5, 0.7],
                      [0.0, 0.0, 0.0, 1.0, 2.0, 3.0, -1.3]], np.float64)
    c3d = boxes_to_corners_3d(boxes)[:, :4, :2]
    bev = boxes_to_corners_bev(boxes)
    # same 4 corners, possibly different starting vertex/winding
    for a, b in zip(c3d, bev):
        sa = sorted(map(tuple, np.round(a, 6)))
        sb = sorted(map(tuple, np.round(b, 6)))
        np.testing.assert_allclose(sa, sb, atol=1e-6)
