import jax
import jax.numpy as jnp
import numpy as np

from tmae_tpu.models.anchor_head import (
    AnchorHeadSingle, anchor_head_loss, anchor_head_predict, generate_anchors,
)
from tmae_tpu.ops.box_coder import (
    ResidualCoder, nearest_bev_iou, aligned_bev_boxes,
)

PC_RANGE = (-5.12, -5.12, -5.0, 5.12, 5.12, 3.0)
CLASS_NAMES = ['Car', 'Pedestrian']

MODEL_CFG = {
    'ANCHOR_GENERATOR_CONFIG': [
        {'class_name': 'Car', 'anchor_sizes': [[4.0, 2.0, 1.6]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': False, 'feature_map_stride': 2,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.7]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
         'align_center': False, 'feature_map_stride': 2,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ],
    'TARGET_ASSIGNER_CONFIG': {'BOX_CODER_CONFIG': {}},
    'USE_DIRECTION_CLASSIFIER': False,
    'LOSS_CONFIG': {
        'LOSS_WEIGHTS': {'cls_weight': 1.0, 'loc_weight': 2.0,
                         'code_weights': [1.0] * 7},
    },
}


def test_residual_coder_roundtrip():
    coder = ResidualCoder()
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(
        np.c_[rng.uniform(-5, 5, (10, 2)), rng.uniform(-2, 0, (10, 1)),
              rng.uniform(1, 4, (10, 3)), rng.uniform(-3, 3, (10, 1))]
    ).astype(jnp.float32)
    boxes = anchors + jnp.asarray(rng.uniform(-0.3, 0.3, (10, 7))).astype(
        jnp.float32
    )
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    assert np.allclose(np.asarray(dec), np.asarray(boxes), atol=1e-4)


def test_nearest_bev_iou_axis_aligned():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[1, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    iou = nearest_bev_iou(a, b)
    assert np.allclose(float(iou[0, 0]), 2 / 6, atol=1e-5)
    # rotated ~90° swaps dims
    c = jnp.asarray([[0, 0, 0, 4, 2, 2, 1.57]], jnp.float32)
    bev = np.asarray(aligned_bev_boxes(c))
    assert np.allclose(bev[0], [-1, -2, 1, 2], atol=0.05)


def test_generate_anchors_shapes():
    anchors = generate_anchors(
        MODEL_CFG['ANCHOR_GENERATOR_CONFIG'], (32, 32), PC_RANGE
    )
    assert anchors[0].shape == (16, 16, 2, 7)
    # centers span the range
    assert np.isclose(anchors[0][0, 0, 0, 0], PC_RANGE[0])
    assert np.isclose(anchors[0][-1, -1, 0, 0], PC_RANGE[3])
    assert np.allclose(anchors[0][..., 3:6], [4.0, 2.0, 1.6])


def test_anchor_head_forward_assign_loss_decode():
    head = AnchorHeadSingle(
        model_cfg=MODEL_CFG, num_class=2, class_names=tuple(CLASS_NAMES),
        grid_size=(32, 32), pc_range=PC_RANGE,
    )
    x = jnp.zeros((2, 16, 16, 8))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(variables, x, train=False)
    assert out['cls_preds'].shape == (2, 16, 16, 4 * 2)
    assert out['box_preds'].shape == (2, 16, 16, 4 * 7)

    gt = np.zeros((2, 4, 8), np.float32)
    gt[0, 0] = [0.0, 0.0, -1.0, 4.0, 2.0, 1.6, 0.0, 1.0]  # Car
    gt[1, 0] = [2.0, 2.0, -1.0, 0.8, 0.6, 1.7, 0.0, 2.0]  # Pedestrian
    gt_mask = np.zeros((2, 4), bool)
    gt_mask[0, 0] = gt_mask[1, 0] = True

    targets = head.apply(
        variables, jnp.asarray(gt), jnp.asarray(gt_mask),
        method=head.assign_targets,
    )
    labels = np.asarray(targets['box_cls_labels'])
    assert labels.shape == (2, 16 * 16 * 4)
    assert (labels[0] == 1).sum() >= 1  # car anchors matched in sample 0
    assert (labels[1] == 2).sum() >= 1  # ped anchors matched in sample 1
    assert (labels >= -1).all() and (labels <= 2).all()

    loss, tb = anchor_head_loss(
        head.bind(variables), out, targets, MODEL_CFG['LOSS_CONFIG']
    )
    assert np.isfinite(float(loss)) and float(loss) > 0

    cls_preds, boxes = anchor_head_predict(head.bind(variables), out)
    assert cls_preds.shape == (2, 16 * 16 * 4, 2)
    assert boxes.shape == (2, 16 * 16 * 4, 7)
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_anchor_head_multi_shapes():
    from tmae_tpu.models.anchor_head import AnchorHeadMulti
    cfg = {
        'ANCHOR_GENERATOR_CONFIG': [
            {'class_name': c, 'anchor_sizes': [[4, 2, 1.6]],
             'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
             'align_center': False, 'feature_map_stride': 2,
             'matched_threshold': 0.5, 'unmatched_threshold': 0.35}
            for c in ('Car', 'Pedestrian', 'Cyclist')],
        'RPN_HEAD_CFGS': [{'HEAD_CLS_NAME': ['Car']},
                          {'HEAD_CLS_NAME': ['Pedestrian', 'Cyclist']}],
        'SHARED_CONV_NUM_FILTER': 16,
    }
    head = AnchorHeadMulti(cfg, 3, ('Car', 'Pedestrian', 'Cyclist'),
                           (32, 32), (-5.12, -5.12, -5, 5.12, 5.12, 3))
    x = jnp.zeros((1, 16, 16, 8))
    v = head.init(jax.random.PRNGKey(0), x, False)
    outs = head.apply(v, x, False)
    assert len(outs) == 2
    assert outs[0]['cls_preds'].shape[-1] == 2   # Car: 2 anchors x 1 class
    assert outs[1]['cls_preds'].shape[-1] == 8   # Ped+Cyc: 4 anchors x 2 cls
    assert outs[1]['box_preds'].shape[-1] == 28  # 4 anchors x 7
