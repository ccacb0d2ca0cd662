"""FULL-detector parity: the reference's CenterPoint+SiamWCA forward (pure
torch, CUDA ops + spconv + torch_scatter shimmed — ref_spconv_shim.py) vs our
detector on one fixture, with weights converted by utils/torch_convert.

This composes what test_module_parity.py checks per-module into the complete
graph — VFE → 3-stage siamese SST pyramid → WCA fusion → deblock fuse → BEV
backbone → CenterHead — so wiring bugs module parity can't see (stage order,
residuals, stride bookkeeping, head plumbing) are caught, and the converter is
proven on an end-to-end state_dict. Reference graph:
``pcdet/models/detectors/centerpoint.py:9-50`` + ``SiamWCA.py:619-690``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ref_loader import CfgDict, load_reference, ref_module
from tiny_cfg import CLASS_NAMES, PC_RANGE, VOXEL_SIZE, synth_batch, tiny_cfg


def _ref_points(pts, pmask):
    """[B, P, 4] padded → reference flat [N, 5] (bs, x, y, z, inten) — the
    group column is already consumed by the dataset's two-frame split before
    the VFE sees points (once_temporal_dataset._split_two_pcs)."""
    rows = []
    for b in range(pts.shape[0]):
        p = pts[b][pmask[b]]
        bs = np.full((len(p), 1), b, np.float32)
        rows.append(np.concatenate([bs, p], axis=1))
    return np.concatenate(rows, axis=0)


def _build_reference(cfg, grid_size):
    import torch

    load_reference()
    vfe_mod = ref_module('pcdet.models.backbones_3d.vfe.temporal_dyn_vfe')
    siam_mod = ref_module('pcdet.models.backbones_3d.SiamWCA')
    bev_mod = ref_module('pcdet.models.backbones_2d.sst_bev_backbone')
    head_mod = ref_module('pcdet.models.dense_heads.center_head')

    class Det(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vfe = vfe_mod.TemporalDynVFE(
                CfgDict(dict(cfg.MODEL.VFE)), num_point_features=5,
                voxel_size=np.array(VOXEL_SIZE), point_cloud_range=np.array(
                    PC_RANGE), grid_size=grid_size)
            self.backbone_3d = siam_mod.SiamWCA(
                CfgDict(dict(cfg.MODEL.BACKBONE_3D)), input_channels=16,
                grid_size=grid_size, voxel_size=np.array(VOXEL_SIZE),
                point_cloud_range=np.array(PC_RANGE))
            self.backbone_2d = bev_mod.SSTBEVBackbone(
                CfgDict(dict(cfg.MODEL.BACKBONE_2D)))
            self.dense_head = head_mod.CenterHead(
                CfgDict(dict(cfg.MODEL.DENSE_HEAD)), input_channels=16,
                num_class=len(CLASS_NAMES), class_names=CLASS_NAMES,
                grid_size=grid_size, point_cloud_range=np.array(PC_RANGE),
                voxel_size=np.array(VOXEL_SIZE),
                predict_boxes_when_training=False)

        def forward(self, batch_dict):
            for m in (self.vfe, self.backbone_3d, self.backbone_2d,
                      self.dense_head):
                batch_dict = m(batch_dict)
            return batch_dict

    return Det()


def _patch_ref_nms():
    """Back the reference's nms_gpu stub with our numpy rotated NMS so its
    full eval path runs without CUDA."""
    import sys
    import torch

    from tmae_tpu.ops import geometry_np as G

    def nms_gpu(boxes, scores, thresh, **kwargs):
        keep = G.nms_bev(boxes.detach().numpy().astype(np.float64),
                         scores.detach().numpy().astype(np.float64),
                         float(thresh))
        keep = torch.as_tensor(np.asarray(keep, np.int64))
        return keep, None

    sys.modules['pcdet.ops.iou3d_nms.iou3d_nms_utils'].nms_gpu = nms_gpu


@pytest.mark.slow
def test_full_detector_forward_parity():
    import torch

    # force f32 through our bf16 compute policy so tolerances catch real
    # wiring bugs, not rounding
    from tmae_tpu.models import layers as L
    from tmae_tpu.models import sst as S
    old_dts = (S.COMPUTE_DTYPE, L.CARRIER_DTYPE, L.CONV_DTYPE)
    S.COMPUTE_DTYPE = jnp.float32
    L.CARRIER_DTYPE = jnp.float32
    L.CONV_DTYPE = jnp.float32
    try:
        _run_parity()
    finally:
        S.COMPUTE_DTYPE, L.CARRIER_DTYPE, L.CONV_DTYPE = old_dts


def _run_parity():
    import torch

    cfg = tiny_cfg(mae=False)
    # the fixture has ~180 voxels/sample; lift the static caps so OUR padded
    # voxel lists hold every voxel the reference's dynamic shapes keep
    cfg.RUNTIME.MAX_VOXELS = [512, 256, 128]
    grid_size = np.array([32, 32, 1])
    rng = np.random.RandomState(42)
    batch = synth_batch(rng, B=2, P=256, n_real=200, n_gt=4)

    ref = _build_reference(cfg, grid_size)
    _patch_ref_nms()
    ref.eval()

    ref_batch = {
        'points': torch.as_tensor(
            _ref_points(batch['points'], batch['point_mask'])),
        'points_prev': torch.as_tensor(
            _ref_points(batch['points_prev'], batch['point_mask_prev'])),
        'batch_size': 2,
    }
    with torch.no_grad():
        out_ref = ref(dict(ref_batch))
    pred_ref = ref.dense_head.forward_ret_dict['pred_dicts']

    # ---- ours, with converted weights ----
    from tmae_tpu.models.detectors import build_detector, centerpoint_predict
    from tmae_tpu.utils.torch_convert import convert_state_dict

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, unmatched = convert_state_dict(sd)
    assert not unmatched, f'unconverted torch keys: {unmatched[:10]}'

    model = build_detector(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jbatch, train=False)
    # converted params must cover the full tree
    conv = {'params': params, 'batch_stats': stats}
    flat_init = jax.tree_util.tree_leaves_with_path(variables['params'])
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(conv['params']))
    missing = [jax.tree_util.keystr(k) for k, _ in flat_init
               if k not in flat_conv]
    assert not missing, f'converter missing params: {missing[:10]}'
    for k, v in flat_init:
        assert flat_conv[k].shape == v.shape, (
            f'shape mismatch at {jax.tree_util.keystr(k)}: '
            f'{flat_conv[k].shape} vs {v.shape}')

    out = model.apply(conv, jbatch, train=False)

    # raw head-map parity (pre-decode): ours stores NHWC, reference NCHW
    for gi, pd_ref in enumerate(pred_ref):
        pd = out['pred_dicts'][gi]
        for key in ('hm', 'center', 'center_z', 'dim', 'rot'):
            a = np.asarray(pd[key], np.float32)          # [B, H, W, C]
            b = pd_ref[key].detach().numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                a, b, atol=5e-3, rtol=5e-3,
                err_msg=f'head map {key} diverges (group {gi})')

    # decoded-box parity through our exact decode + both NMS paths
    boxes, scores, labels, valid = jax.device_get(
        centerpoint_predict(cfg, out, nms_on_device=False))
    from tmae_tpu.models.detectors import host_nms
    valid = host_nms(cfg, boxes, scores, labels, valid)
    fin_ref = out_ref['final_box_dicts']
    for b in range(2):
        vb = np.asarray(valid[b])
        ours = np.asarray(boxes[b])[vb]
        ours_s = np.asarray(scores[b])[vb]
        rb = fin_ref[b]['pred_boxes'].detach().numpy()
        rs = fin_ref[b]['pred_scores'].detach().numpy()
        # same candidate count and score ordering within tolerance
        assert abs(len(ours) - len(rb)) <= 1, (len(ours), len(rb))
        n = min(len(ours), len(rb))
        order_o = np.argsort(-ours_s)[:n]
        order_r = np.argsort(-rs)[:n]
        np.testing.assert_allclose(ours_s[order_o], rs[order_r], atol=2e-3)
        np.testing.assert_allclose(ours[order_o][:, :3],
                                   rb[order_r][:, :3], atol=5e-2)
