"""CenterHead IoU-head branch (reference center_head.py:97,260-299) and the
multi-class NMS variants (model_nms_utils.py:28-87): target iou_boxes slots,
IoULossCenterNet parity, IoU-rectified per-class NMS parity, and a
config-driven train/predict smoke with 'iou' in HEAD_DICT."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from ref_loader import ref_module
import tmae_tpu.ops.geometry_np as gnp

PC_RANGE = [-10.0, -10.0, -5.0, 10.0, 10.0, 3.0]
VOXEL = [0.25, 0.25, 8.0]
H = W = 80


def _boxes(rng, n, spread=8.0):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-spread, spread, n)
    b[:, 1] = rng.uniform(-spread, spread, n)
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3] = rng.uniform(1.0, 4.0, n)
    b[:, 4] = rng.uniform(1.0, 3.0, n)
    b[:, 5] = rng.uniform(1.0, 2.5, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_iou_boxes_target_slot_parity():
    """'iou_boxes' (raw gt box per slot) matches the reference assigner's
    third output (center_head.py:160-165)."""
    import types

    ch = ref_module('pcdet.models.dense_heads.center_head')
    from tmae_tpu.ops.centernet import assign_center_targets

    rng = np.random.RandomState(0)
    g = np.concatenate([_boxes(rng, 6), rng.randint(1, 4, (6, 1))], 1).astype(
        np.float32)
    M = 10
    shim = types.SimpleNamespace(
        point_cloud_range=torch.tensor(PC_RANGE),
        voxel_size=torch.tensor(VOXEL),
    )
    _, _, iou_ref, _, mask_ref = ch.CenterHead.assign_target_of_single_head(
        shim, num_classes=3, gt_boxes=torch.from_numpy(g),
        feature_map_size=[W, H], feature_map_stride=1, num_max_objs=M,
        gaussian_overlap=0.1, min_radius=2,
    )
    gt_pad = np.zeros((1, M, 8), np.float32)
    gt_pad[0, :len(g)] = g
    gt_mask = np.zeros((1, M), bool)
    gt_mask[0, :len(g)] = True
    ours = assign_center_targets(
        jnp.asarray(gt_pad), jnp.asarray(gt_mask), 3, (W, H), PC_RANGE,
        VOXEL, feature_map_stride=1, gaussian_overlap=0.1, min_radius=2,
    )
    m = mask_ref.numpy().astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours['iou_boxes'][0])[m], iou_ref.numpy()[m], atol=1e-5)


def test_iou_loss_parity():
    """centernet_iou_loss vs reference IoULossCenterNet (loss_utils.py:399-419)
    with the CUDA pair-IoU stubbed by the numpy rotated IoU."""
    lu = ref_module('pcdet.utils.loss_utils')

    def iou3d_stub(a, b):
        return torch.from_numpy(
            gnp.boxes_iou3d(a.numpy().astype(np.float64),
                            b.numpy().astype(np.float64)).astype(np.float32))

    lu.iou3d_nms_utils.boxes_iou3d_gpu = iou3d_stub

    from tmae_tpu.ops.losses import centernet_iou_loss

    rng = np.random.RandomState(1)
    B, M = 2, 6
    iou_maps = rng.randn(B, 1, H, W).astype(np.float32)
    box_maps = rng.randn(B, 7, H, W).astype(np.float32)
    # make the box maps decodable-ish: positive dims
    box_maps[:, 3:6] = np.abs(box_maps[:, 3:6]) + 1.0
    box_maps[:, 0] = box_maps[:, 0] * 3
    box_maps[:, 1] = box_maps[:, 1] * 3
    inds = rng.randint(0, H * W, (B, M)).astype(np.int64)
    mask = rng.rand(B, M) < 0.7
    gt = np.stack([_boxes(rng, M), _boxes(rng, M)])
    # overlap some gts with the gathered pred boxes so IoU isn't all zero
    flat = box_maps.reshape(B, 7, H * W)
    for b in range(B):
        for k in range(0, M, 2):
            gt[b, k] = flat[b, :, inds[b, k]]
            gt[b, k, 6] += 0.2

    ref = lu.IoULossCenterNet()(
        torch.from_numpy(iou_maps), torch.from_numpy(mask),
        torch.from_numpy(inds), torch.from_numpy(box_maps),
        torch.from_numpy(gt.astype(np.float32)),
    ).item()

    from tmae_tpu.ops import centernet as C
    iou_pred = C.gather_feat_nhwc(
        jnp.asarray(iou_maps.transpose(0, 2, 3, 1)), jnp.asarray(inds)
    )[..., 0]
    pred_boxes = C.gather_feat_nhwc(
        jnp.asarray(box_maps.transpose(0, 2, 3, 1)), jnp.asarray(inds))
    ours = float(centernet_iou_loss(
        iou_pred, jnp.asarray(mask), pred_boxes, jnp.asarray(gt)))
    assert abs(ref - ours) < 2e-3 * max(1.0, abs(ref)), (ref, ours)


def test_multi_class_agnostic_nms_parity():
    """Rectified per-class NMS vs the reference multi_class_agnostic_nms
    (model_nms_utils.py:28-46) with nms_gpu stubbed by the numpy NMS."""
    mn = ref_module('pcdet.models.model_utils.model_nms_utils')

    def nms_stub(boxes, scores, thresh, **kw):
        keep = gnp.nms_bev(boxes.numpy().astype(np.float64),
                           scores.numpy(), float(thresh))
        return torch.from_numpy(np.asarray(keep, np.int64)), None

    mn.iou3d_nms_utils.nms_gpu = nms_stub

    from types import SimpleNamespace as EasyDict
    rng = np.random.RandomState(2)
    N, ncls = 60, 3
    boxes = _boxes(rng, N)
    scores = rng.rand(N).astype(np.float32)
    ious = rng.rand(N).astype(np.float32)
    labels = rng.randint(0, ncls, N).astype(np.int64)
    nms_cfg = EasyDict(
        IOU_RECTIFIER=[0.68, 0.71, 0.65],
        NMS_THRESH=[0.7, 0.6, 0.55],
        NMS_PRE_MAXSIZE=[64, 64, 64],
        NMS_POST_MAXSIZE=[40, 40, 40],
    )
    sel_ref, rect_ref = mn.multi_class_agnostic_nms(
        torch.from_numpy(scores), torch.from_numpy(ious),
        torch.from_numpy(labels), torch.from_numpy(boxes), nms_cfg,
    )
    sel, rect = gnp.multi_class_agnostic_nms(
        scores, ious, labels, boxes,
        iou_rectifier=nms_cfg.IOU_RECTIFIER, nms_thresh=nms_cfg.NMS_THRESH,
        pre_maxsize=nms_cfg.NMS_PRE_MAXSIZE,
        post_maxsize=nms_cfg.NMS_POST_MAXSIZE,
    )
    assert set(sel.tolist()) == set(sel_ref.numpy().tolist())
    np.testing.assert_allclose(
        np.sort(rect), np.sort(rect_ref.numpy()), rtol=1e-5)


def _iou_cfg():
    from tests.tiny_cfg import tiny_cfg
    cfg = tiny_cfg(mae=False)
    hd = cfg.MODEL.DENSE_HEAD
    hd.SEPARATE_HEAD_CFG.HEAD_DICT['iou'] = {'out_channels': 1, 'num_conv': 2}
    hd.LOSS_CONFIG.LOSS_WEIGHTS['iou_weight'] = 1.0
    hd.POST_PROCESSING.NMS_CONFIG = {
        'NMS_TYPE': 'multi_class_nms',
        'IOU_RECTIFIER': [0.68, 0.71, 0.65, 0.65, 0.68],
        'NMS_THRESH': [0.7, 0.6, 0.55, 0.55, 0.55],
        'NMS_PRE_MAXSIZE': [64] * 5,
        'NMS_POST_MAXSIZE': [16] * 5,
    }
    return cfg


def test_iou_head_train_and_predict():
    """A config with 'iou' in HEAD_DICT trains (iou loss term present, grads
    finite) and evals through both the device and host multi-class NMS."""
    from tests.tiny_cfg import synth_batch
    from tmae_tpu.models.detectors import (
        build_detector, centerpoint_loss, centerpoint_predict, host_nms,
    )

    cfg = _iou_cfg()
    model = build_detector(cfg)
    rng = np.random.RandomState(3)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(rng).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        out = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'])[0]
        loss, tb = centerpoint_loss(cfg, out, batch)
        return loss, tb

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(loss))
    assert 'iou_loss_head_0' in tb and np.isfinite(float(tb['iou_loss_head_0']))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax)
    # the iou head params receive gradient
    iou_g = grads['dense_head']['head_0']['iou_out']['kernel']
    assert float(jnp.abs(iou_g).max()) >= 0.0 and np.isfinite(
        float(jnp.abs(iou_g).max()))

    out = model.apply(variables, batch, train=False)
    dev = centerpoint_predict(cfg, out, nms_on_device=True)
    boxes, scores, labels, valid = jax.device_get(
        centerpoint_predict(cfg, out, nms_on_device=False))
    host_valid = host_nms(cfg, boxes, scores, labels, valid)
    # both paths keep the same candidate set
    np.testing.assert_array_equal(
        np.asarray(dev[3]).astype(int), host_valid.astype(int))
