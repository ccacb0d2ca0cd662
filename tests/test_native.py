"""Native C++ host-ops vs numpy fallback parity."""

import numpy as np
import pytest

from tmae_tpu.utils import native
from tmae_tpu.ops import geometry_np as gnp


@pytest.fixture(scope='module')
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip('native host-ops unavailable')
    return l


def rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    return np.c_[
        rng.uniform(-10, 10, (n, 2)), rng.uniform(-2, 1, (n, 1)),
        rng.uniform(0.5, 5, (n, 3)), rng.uniform(-np.pi, np.pi, (n, 1)),
    ]


def test_native_intersection_matches_numpy(lib):
    a, b = rand_boxes(20, 0), rand_boxes(15, 1)
    nat = native.intersection_area_bev(a, b)
    ref = gnp._pairwise_intersection_area(a, b)
    assert np.allclose(nat, ref, atol=1e-6)


def test_native_iou3d_matches_numpy(lib):
    a, b = rand_boxes(12, 2), rand_boxes(9, 3)
    nat = native.iou3d(a, b, with_heading=True)
    # numpy reference built from the chunked path directly
    inter = gnp._pairwise_intersection_area(a, b)
    amax = (a[:, 2] + a[:, 5] / 2)[:, None]
    amin = (a[:, 2] - a[:, 5] / 2)[:, None]
    bmax = (b[:, 2] + b[:, 5] / 2)[None, :]
    bmin = (b[:, 2] - b[:, 5] / 2)[None, :]
    ih = np.clip(np.minimum(amax, bmax) - np.maximum(amin, bmin), 0, None)
    i3 = inter * ih
    va = (a[:, 3] * a[:, 4] * a[:, 5])[:, None]
    vb = (b[:, 3] * b[:, 4] * b[:, 5])[None, :]
    ref = i3 / np.clip(va + vb - i3, 1e-6, None)
    d = np.abs(a[:, 6][:, None] - b[None, :, 6])
    d = np.where(d >= np.pi, 2 * np.pi - d, d)
    ref[d > np.pi / 2] = 0
    assert np.allclose(nat, ref, atol=1e-6)


def test_native_nms(lib):
    boxes = rand_boxes(30, 4)
    scores = np.sort(np.random.RandomState(5).uniform(0, 1, 30))[::-1]
    keep_nat = native.nms_bev_sorted(boxes, 0.3, 30)
    keep_ref = gnp.nms_bev(boxes, scores.copy(), 0.3)
    assert set(np.nonzero(keep_nat)[0].tolist()) == set(keep_ref.tolist())


def test_native_points_in_boxes(lib):
    pts = np.array([[0, 0, 0], [10, 10, 10], [3, 3, 0]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.5], [3, 3, 0, 2, 2, 2, 0.0]])
    idx = native.points_in_boxes(pts, boxes)
    assert idx.tolist() == [0, -1, 1]


def test_native_eval_loops(lib):
    from tmae_tpu.datasets.once_eval import (
        accumulate_scores, compute_statistics,
    )
    rng = np.random.RandomState(6)
    iou = rng.uniform(0, 1, (6, 8))
    scores = rng.uniform(0, 1, 8)
    gflag = np.array([0, 0, -1, 1, 0, 0], np.int64)
    pflag = np.array([0, 0, 0, -1, 1, 0, 0, 0], np.int64)
    nat = native.accumulate_scores(iou, scores, gflag, pflag, 0.5)
    ref = accumulate_scores(iou, scores, gflag, pflag, 0.5)
    assert np.allclose(np.sort(nat), np.sort(ref))
    ths = np.array([0.2, 0.5, 0.8])
    nat_s = native.compute_statistics_all(iou, scores, gflag, pflag, ths, 0.5)
    for ti, th in enumerate(ths):
        ref_s = compute_statistics(iou, scores, gflag, pflag, th, 0.5)
        assert tuple(nat_s[ti]) == ref_s


def test_eval_uses_native_end_to_end(lib):
    # full AP pipeline still correct with native fast paths active
    from tmae_tpu.datasets.once_eval import get_evaluation_results
    gt = [{'name': np.array(['Car', 'Pedestrian', 'Cyclist']),
           'boxes_3d': np.array([[0, 0, 0, 4, 2, 1.6, 0.2],
                                 [5, 5, 0, 0.7, 0.7, 1.7, 0.0],
                                 [-5, 2, 0, 1.8, 0.7, 1.7, 1.0]])}]
    pred = [{'name': np.array(['Car', 'Pedestrian', 'Cyclist']),
             'boxes_3d': gt[0]['boxes_3d'].copy(),
             'score': np.array([0.9, 0.8, 0.7])}]
    s, d = get_evaluation_results(
        gt, pred, ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']
    )
    assert d['AP_Vehicle/overall'] == 100.0
    assert d['AP_mean/overall'] == 100.0
