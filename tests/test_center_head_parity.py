"""CenterHead math parity against the reference: gaussian-splat target
assignment (center_head.py:108-165), CenterNet focal + masked-L1 reg losses
(loss_utils.py:274-396), and heatmap decode (centernet_utils.py:154-220)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, str(Path(__file__).parent))

import jax.numpy as jnp

from ref_loader import ref_module

PC_RANGE = [-10.0, -10.0, -5.0, 10.0, 10.0, 3.0]
VOXEL = [0.25, 0.25, 8.0]
H = W = 80


def _gt_boxes(rng, n, num_classes=3):
    b = np.zeros((n, 8), np.float32)
    b[:, 0] = rng.uniform(-9, 9, n)
    b[:, 1] = rng.uniform(-9, 9, n)
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3] = rng.uniform(1.0, 5.0, n)
    b[:, 4] = rng.uniform(1.0, 3.0, n)
    b[:, 5] = rng.uniform(1.0, 2.5, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    b[:, 7] = rng.randint(1, num_classes + 1, n)
    return b


def test_target_assignment_parity():
    ch = ref_module('pcdet.models.dense_heads.center_head')
    from tmae_tpu.ops.centernet import assign_center_targets

    rng = np.random.RandomState(0)
    num_classes = 3
    gts = [_gt_boxes(rng, 7, num_classes), _gt_boxes(rng, 4, num_classes)]
    M = 10

    shim = types.SimpleNamespace(
        point_cloud_range=torch.tensor(PC_RANGE),
        voxel_size=torch.tensor(VOXEL),
    )
    hm_ref, box_ref, inds_ref, mask_ref = [], [], [], []
    for g in gts:
        hm, rb, _iou, inds, mask = ch.CenterHead.assign_target_of_single_head(
            shim, num_classes=num_classes, gt_boxes=torch.from_numpy(g),
            feature_map_size=[W, H], feature_map_stride=1, num_max_objs=M,
            gaussian_overlap=0.1, min_radius=2,
        )
        hm_ref.append(hm.numpy())
        box_ref.append(rb.numpy())
        inds_ref.append(inds.numpy())
        mask_ref.append(mask.numpy())
    hm_ref = np.stack(hm_ref)
    box_ref = np.stack(box_ref)
    inds_ref = np.stack(inds_ref)
    mask_ref = np.stack(mask_ref)

    gt_pad = np.zeros((2, M, 8), np.float32)
    gt_mask = np.zeros((2, M), bool)
    for i, g in enumerate(gts):
        gt_pad[i, :len(g)] = g
        gt_mask[i, :len(g)] = True
    ours = assign_center_targets(
        jnp.asarray(gt_pad), jnp.asarray(gt_mask), num_classes, (W, H),
        PC_RANGE, VOXEL, feature_map_stride=1, gaussian_overlap=0.1,
        min_radius=2,
    )
    np.testing.assert_allclose(np.asarray(ours['heatmap']), hm_ref, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ours['inds']), inds_ref)
    np.testing.assert_array_equal(
        np.asarray(ours['mask']).astype(np.int64), mask_ref)
    np.testing.assert_allclose(
        np.asarray(ours['target_boxes']), box_ref, atol=1e-5)


def test_focal_and_reg_loss_parity():
    lu = ref_module('pcdet.utils.loss_utils')
    from tmae_tpu.models.center_head import (
        focal_loss_centernet, reg_loss_centernet, sigmoid_clamped,
    )

    rng = np.random.RandomState(1)
    B, ncls = 2, 3
    logits = rng.randn(B, ncls, H, W).astype(np.float32)
    # reference heatmap targets contain exact 1.0 peaks
    gt = np.clip(rng.rand(B, ncls, H, W).astype(np.float32) * 1.2, 0, 1)
    gt[gt > 0.95] = 1.0

    t_pred = torch.sigmoid(torch.from_numpy(logits)).clamp(1e-4, 1 - 1e-4)
    ref = lu.FocalLossCenterNet()(t_pred, torch.from_numpy(gt)).item()
    ours = float(focal_loss_centernet(
        sigmoid_clamped(jnp.asarray(logits)), jnp.asarray(gt)))
    assert abs(ref - ours) < 1e-4 * max(1, abs(ref)), (ref, ours)

    # reg loss at center cells
    M, D = 6, 8
    pred_maps = rng.randn(B, D, H, W).astype(np.float32)
    inds = rng.randint(0, H * W, (B, M)).astype(np.int64)
    target = rng.randn(B, M, D).astype(np.float32)
    mask = (rng.rand(B, M) < 0.7)
    code_w = rng.uniform(0.5, 2.0, D).astype(np.float32)

    reg = lu.RegLossCenterNet()(
        torch.from_numpy(pred_maps), mask=torch.from_numpy(mask),
        ind=torch.from_numpy(inds), target=torch.from_numpy(target),
    )  # [D] per-dim loss
    ref_total = float((reg * torch.from_numpy(code_w)).sum())
    ours_total = float(reg_loss_centernet(
        jnp.asarray(pred_maps.transpose(0, 2, 3, 1)), jnp.asarray(inds),
        jnp.asarray(target), jnp.asarray(mask), code_w,
    ))
    assert abs(ref_total - ours_total) < 1e-3 * max(1, abs(ref_total))


def test_decode_bbox_parity():
    cn = ref_module('pcdet.models.model_utils.centernet_utils')
    from tmae_tpu.ops.centernet import decode_bbox_from_heatmap

    rng = np.random.RandomState(2)
    B, ncls, K = 1, 3, 20
    hm = torch.sigmoid(torch.from_numpy(
        rng.randn(B, ncls, H, W).astype(np.float32)))
    center = torch.from_numpy(rng.rand(B, 2, H, W).astype(np.float32))
    center_z = torch.from_numpy(rng.randn(B, 1, H, W).astype(np.float32))
    dim = torch.from_numpy(rng.rand(B, 3, H, W).astype(np.float32) * 0.5)
    rot_cos = torch.from_numpy(rng.rand(B, 1, H, W).astype(np.float32))
    rot_sin = torch.from_numpy(rng.rand(B, 1, H, W).astype(np.float32))

    iou = torch.from_numpy(rng.rand(B, 1, H, W).astype(np.float32))
    lim = torch.tensor([-1e9, -1e9, -1e9, 1e9, 1e9, 1e9])

    ref = cn.decode_bbox_from_heatmap(
        heatmap=hm, rot_cos=rot_cos, rot_sin=rot_sin, center=center,
        center_z=center_z, dim=dim, vel=None, iou=iou,
        point_cloud_range=PC_RANGE, voxel_size=VOXEL, feature_map_stride=1,
        K=K, score_thresh=None, post_center_limit_range=lim,
    )[0]

    j = lambda t: jnp.asarray(t.numpy())  # NCHW, same layout as torch
    boxes, scores, labels, valid = decode_bbox_from_heatmap(
        j(hm), j(rot_cos), j(rot_sin), j(center),
        j(center_z), j(dim), PC_RANGE, VOXEL,
        feature_map_stride=1, K=K, score_thresh=-1.0,
        post_center_limit_range=np.asarray(lim),
    )
    assert bool(np.asarray(valid).all())  # limit range keeps everything
    np.testing.assert_allclose(
        np.asarray(boxes[0]), ref['pred_boxes'].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(scores[0]), ref['pred_scores'].numpy(), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(labels[0]), ref['pred_labels'].numpy())
