import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.models.roi_head import (
    assign_roi_targets, decode_rcnn_boxes, encode_local_residuals,
    proposal_layer, roi_head_loss,
)
from tmae_tpu.ops.box_coder import ResidualCoder
from tmae_tpu.ops.dcn import deform_conv2d
from tmae_tpu.ops.roi_pool import roilocal_dfvs_pool3d

SAMPLER_CFG = {
    'ROI_PER_IMAGE': 8, 'FG_RATIO': 0.5,
    'REG_FG_THRESH': 0.55, 'CLS_FG_THRESH': 0.6,
    'CLS_BG_THRESH': 0.45, 'CLS_BG_THRESH_LO': 0.1,
    'HARD_BG_RATIO': 0.8, 'CLS_SCORE_TYPE': 'roi_iou',
    'SAMPLE_ROI_BY_EACH_CLASS': False,
}


def make_proposals():
    rng = np.random.RandomState(0)
    N = 32
    boxes = np.zeros((2, N, 7), np.float32)
    boxes[..., :2] = rng.uniform(-10, 10, (2, N, 2))
    boxes[..., 3:6] = [4.0, 2.0, 1.6]
    cls = rng.uniform(0, 1, (2, N, 3)).astype(np.float32)
    return jnp.asarray(cls), jnp.asarray(boxes), jnp.ones((2, N), bool)


def test_proposal_layer():
    cls, boxes, valid = make_proposals()
    rois, scores, labels, mask = proposal_layer(
        cls, boxes, valid,
        {'NMS_PRE_MAXSIZE': 16, 'NMS_THRESH': 0.7, 'NMS_POST_MAXSIZE': 8}, 8,
    )
    assert rois.shape == (2, 8, 7)
    s = np.asarray(scores)
    m = np.asarray(mask)
    assert m.any()
    # kept scores are sorted descending within the valid prefix
    for b in range(2):
        v = s[b][m[b]]
        assert np.all(np.diff(v) <= 1e-6)
    assert np.all(np.asarray(labels)[m] >= 1)


@pytest.mark.slow
def test_roi_targets_and_loss():
    rng = np.random.RandomState(1)
    rois = np.zeros((1, 16, 7), np.float32)
    rois[..., :2] = rng.uniform(-5, 5, (1, 16, 2))
    rois[..., 3:6] = [4.0, 2.0, 1.6]
    # make a few rois sit exactly on the gt
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0] = [0, 0, 0, 4.0, 2.0, 1.6, 0.2, 1]
    gt_mask = np.zeros((1, 3), bool)
    gt_mask[0, 0] = True
    rois[0, :3, :2] = [[0, 0], [0.3, 0.1], [-0.2, 0.2]]
    rois[0, :3, 6] = 0.2

    targets = assign_roi_targets(
        jax.random.PRNGKey(0), jnp.asarray(rois),
        jnp.ones((1, 16)), jnp.ones((1, 16), jnp.int32),
        jnp.ones((1, 16), bool), jnp.asarray(gt), jnp.asarray(gt_mask),
        SAMPLER_CFG,
    )
    assert targets['rois'].shape == (1, 8, 7)
    fg = np.asarray(targets['reg_valid_mask'])
    assert fg.sum() >= 1
    # canonical gt of a perfectly-matching roi is (0,0,0,dims,0)
    ious = np.asarray(targets['gt_iou_of_rois'])
    best = ious.argmax()
    canon = np.asarray(targets['gt_of_rois'][0, best])
    assert np.allclose(canon[:3], 0, atol=1e-4)
    assert abs(canon[6]) < 1e-4

    coder = ResidualCoder(code_size=7)
    rcnn_cls = jnp.zeros((1, 8, 1))
    # perfect regression: predict the encoded residuals exactly
    reg_t = encode_local_residuals(targets['gt_of_rois'], targets['rois'],
                                   coder)
    loss, tb = roi_head_loss(
        rcnn_cls, reg_t, targets, coder,
        {'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                          'rcnn_corner_weight': 1.0,
                          'code_weights': [1.0] * 7},
         'CORNER_LOSS_REGULARIZATION': True, 'CLS_LOSS': 'BinaryCrossEntropy',
         'REG_LOSS': 'WeightedSmoothL1Loss'},
    )
    assert np.isfinite(float(loss))
    assert float(tb['rcnn_loss_reg']) < 1e-5
    # decode of perfect residuals reproduces the gt box (world frame)
    dec = decode_rcnn_boxes(reg_t, targets['rois'], coder)
    src = np.asarray(targets['gt_of_rois_src'][0, best, :7])
    got = np.asarray(dec[0, best, :7])
    np.testing.assert_allclose(got[:6], src[:6], atol=1e-3)
    assert abs((got[6] - src[6] + np.pi) % (2 * np.pi) - np.pi) < 1e-3


def test_roilocal_dfvs_pool():
    pts = jnp.asarray(np.array(
        [[[0.2, 0.1, 0.0], [0.4, -0.2, 0.1], [0.1, 0.3, -0.2],
          [9.0, 9.0, 9.0]]], np.float32))
    pmask = jnp.ones((1, 4), bool)
    boxes = jnp.asarray(np.array([[[0, 0, 0, 2, 2, 2, 0.0]]], np.float32))
    bmask = jnp.ones((1, 1), bool)
    pooled, empty = roilocal_dfvs_pool3d(pts, pmask, boxes, bmask,
                                         num_dvs_points=4, num_fps_points=2)
    assert pooled.shape == (1, 1, 2, 3)
    assert not bool(empty[0, 0])
    # all pooled points must come from inside the box (canonical |xyz| <= 1)
    assert np.all(np.abs(np.asarray(pooled)) <= 1.0 + 1e-5)


def test_deform_conv2d_matches_plain_conv_at_zero_offset():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    offset = jnp.zeros((1, 6, 6, 18))
    mask = jnp.ones((1, 6, 6, 9))
    out = deform_conv2d(x, offset, mask, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_graph_rcnn_end_to_end():
    from tmae_tpu.config import Cfg
    from tmae_tpu.models.graph_rcnn import (
        GraphRCNN, graph_rcnn_loss, graph_rcnn_predict,
    )
    from tmae_tpu.models.anchor_head import AnchorHeadSingle
    from tmae_tpu.ops.voxelize import VoxelSpec

    nx = ny = 32
    nz = 40  # VoxelBackBone8x compresses z by 16x; shallow grids collapse to 0
    spec = VoxelSpec(
        voxel_size=(0.4, 0.4, 0.1), pc_range=(-6.4, -6.4, -2.0, 6.4, 6.4, 2.0),
        max_points=128, max_voxels=64,
    )
    model_cfg = Cfg.from_dict({
        'BACKBONE_3D': {},
        'BACKBONE_2D': {
            'LAYER_NUMS': [2], 'LAYER_STRIDES': [1], 'NUM_FILTERS': [32],
            'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [32],
        },
        'DENSE_HEAD': {
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[1.6, 1.2, 1.2]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.0], 'align_center': False,
                 'feature_map_stride': 16, 'matched_threshold': 0.5,
                 'unmatched_threshold': 0.35}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER_CONFIG': {}},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0,
                'code_weights': [1.0] * 7}},
        },
        'ROI_HEAD': {
            'NMS_CONFIG': {
                'TRAIN': {'NMS_PRE_MAXSIZE': 32, 'NMS_THRESH': 0.8,
                          'NMS_POST_MAXSIZE': 16},
                'TEST': {'NMS_PRE_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                         'NMS_POST_MAXSIZE': 8},
            },
            'TARGET_CONFIG': dict(SAMPLER_CFG, BOX_CODER='ResidualCoder'),
            'DFVS_CONFIG': {'NUM_DVS_POINTS': 16, 'NUM_FPS_POINTS': 8,
                            'POOL_EXTRA_WIDTH': 0.5},
            'ATTN_GNN_CONFIG': {'K': 4, 'MLPS': [16, 16], 'CALIB_DIM': 16,
                                'EXP_MLPS': [32], 'OUT_DIM': 32,
                                'USE_REDUCTION': True, 'USE_SHORT_CUT': True,
                                'USE_FEATS_DIS': False},
            'LOSS_CONFIG': {
                'CLS_LOSS': 'BinaryCrossEntropy',
                'REG_LOSS': 'WeightedSmoothL1Loss',
                'CORNER_LOSS_REGULARIZATION': True,
                'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0,
                                 'rcnn_reg_weight': 1.0,
                                 'rcnn_corner_weight': 1.0,
                                 'code_weights': [1.0] * 7},
            },
        },
    })
    rng = np.random.RandomState(0)
    V, P = 64, 128
    batch = {
        'voxels': jnp.asarray(rng.randn(1, V, 5, 4).astype(np.float32)),
        'voxel_num_points': jnp.asarray(
            rng.randint(1, 5, (1, V)).astype(np.int32)),
        'voxel_coords_zyx': jnp.asarray(np.c_[
            rng.randint(0, nz, (V, 1)), rng.randint(0, ny, (V, 1)),
            rng.randint(0, nx, (V, 1))].astype(np.int32)[None]),
        'voxel_mask': jnp.ones((1, V), bool),
        'points': jnp.asarray(
            rng.uniform(-3, 3, (1, P, 4)).astype(np.float32)),
        'point_mask': jnp.ones((1, P), bool),
        'gt_boxes': jnp.asarray(np.array(
            [[[0, 0, 0, 1.6, 1.2, 1.2, 0.1, 1],
              [1.5, 1.5, 0, 1.6, 1.2, 1.2, -0.3, 1]]], np.float32)),
        'gt_mask': jnp.ones((1, 2), bool),
    }
    model = GraphRCNN(model_cfg=model_cfg, class_names=('Car',), spec=spec,
                      max_voxels_per_level=(64, 64, 64, 64))
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'proposal': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)},
        batch, True,
    )
    out, _ = model.apply(
        variables, batch, True, mutable=['batch_stats'],
        rngs={'proposal': jax.random.PRNGKey(3),
              'dropout': jax.random.PRNGKey(4)},
    )
    assert out['rcnn_cls'].shape == (1, 8, 1)
    head = AnchorHeadSingle(
        model_cfg['DENSE_HEAD'], 1, ('Car',), (nx, ny), spec.pc_range,
    )
    bound = head.bind({'params': variables['params']['dense_head']})
    cfg = Cfg.from_dict({'MODEL': dict(model_cfg), 'CLASS_NAMES': ['Car']})
    loss, tb = graph_rcnn_loss(cfg, out, batch, bound)
    assert np.isfinite(float(loss))
    assert 'rcnn_loss' in tb and 'rpn_loss_cls' in tb

    # eval path
    out_e = model.apply(variables, batch, False)
    pred = graph_rcnn_predict(cfg, out_e)
    assert pred['pred_boxes'].shape == (1, 8, 7)
    assert np.all(np.isfinite(np.asarray(pred['pred_scores'])))
