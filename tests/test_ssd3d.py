import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.models.ssd3d import SSD3D, ssd3d_loss, ssd3d_predict
from tmae_tpu.ops.box_coder import PointBinResidualCoder


def make_cfg():
    return Cfg.from_dict({
        'CLASS_NAMES': ['Car', 'Pedestrian', 'Cyclist'],
        'MODEL': {
            'NAME': 'SSD3D',
            'BACKBONE_3D': {
                'SA_CONFIG': {
                    'NPOINTS': [[32], [16, 8]],
                    'SAMPLE_RANGE': [[[0, -1]], [[0, 16], [16, 32]]],
                    'SAMPLE_METHOD': [['d-fps'], ['f-fps', 'd-fps']],
                    'RADIUS': [[0.5, 1.0], [1.0, 2.0]],
                    'NSAMPLE': [[8, 8], [8, 8]],
                    'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
                    'AGGREGATION_MLPS': [[16], [32]],
                    'DILATED_RADIUS_GROUP': True,
                },
            },
            'POINT_HEAD': {
                'VOTE_CONFIG': {
                    'SAMPLE_RANGE': [0, 16],
                    'VOTE_XYZ_RANGE': [3.0, 3.0, 2.0],
                    'MLPS': [16],
                },
                'VOTE_SA_CONFIG': {
                    'RADIUS': [1.0, 2.0],
                    'NSAMPLE': [8, 8],
                    'MLPS': [[16, 16], [16, 16]],
                },
                'SHARED_FC': [32],
                'CLS_FC': [16],
                'REG_FC': [16],
                'TARGET_CONFIG': {
                    'BOX_CODER': 'PointBinResidualCoder',
                    'BOX_CODER_CONFIG': {
                        'angle_bin_num': 12,
                        'use_mean_size': True,
                        'mean_size': [[3.9, 1.6, 1.56],
                                      [0.8, 0.6, 1.73],
                                      [1.76, 0.6, 1.73]],
                    },
                    'GT_EXTRA_WIDTH': [1.0, 1.0, 1.0],
                    'GT_CENTRAL_RADIUS': 10.0,
                },
                'LOSS_CONFIG': {
                    'CLS_LOSS': 'WeightedBinaryCrossEntropyLossWithCenterness',
                    'CLS_POS_NORM': True,
                    'REG_LOSS': 'WeightedSmoothL1Loss',
                    'CORNER_LOSS_TYPE': 1,
                    'LOSS_WEIGHTS': {
                        'seed_reg_weight_list': [1.0],
                        'vote_cls_weight': 1.0,
                        'vote_reg_weight': 1.0,
                        'vote_corner_weight': 1.0,
                        'aux_cls_weight_list': [],
                    },
                },
            },
        },
    })


def make_batch(rng):
    B, P = 2, 64
    pts = np.c_[rng.uniform(-8, 8, (B * P, 3)),
                rng.uniform(0, 1, (B * P, 1))].astype(np.float32)
    gt = np.zeros((B, 4, 8), np.float32)
    gt[:, 0] = [0, 0, 0, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [4, 4, 0, 0.8, 0.6, 1.73, -0.5, 2]
    gt_mask = np.zeros((B, 4), bool)
    gt_mask[:, :2] = True
    return {
        'points': jnp.asarray(pts.reshape(B, P, 4)),
        'point_mask': jnp.ones((B, P), bool),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.asarray(gt_mask),
    }


def test_bin_coder_roundtrip():
    coder = PointBinResidualCoder(angle_bin_num=12, use_mean_size=True,
                                  mean_size=[[3.9, 1.6, 1.56]])
    boxes = jnp.asarray([[1.0, 2.0, -0.5, 4.2, 1.5, 1.4, 2.3]])
    pts = jnp.asarray([[0.5, 1.5, 0.0]])
    cls = jnp.asarray([1], jnp.int32)
    enc = coder.encode(boxes, pts, cls)
    assert enc.shape == (1, coder.code_size)
    dec = coder.decode(enc, pts, cls)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(boxes),
                               rtol=1e-4, atol=1e-4)
    # angle wrap: -pi..pi inputs round-trip modulo 2pi
    boxes2 = boxes.at[0, 6].set(-2.9)
    dec2 = coder.decode(coder.encode(boxes2, pts, cls), pts, cls)
    assert np.isclose(float(dec2[0, 6]) % (2 * np.pi),
                      -2.9 % (2 * np.pi), atol=1e-4)


@pytest.mark.slow
def test_ssd3d_forward_loss_predict():
    cfg = make_cfg()
    batch = make_batch(np.random.RandomState(0))
    model = SSD3D(model_cfg=cfg['MODEL'], class_names=tuple(cfg['CLASS_NAMES']))
    variables = model.init(jax.random.PRNGKey(0), batch, True)

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, True, mutable=['batch_stats'],
        )
        total, tb = ssd3d_loss(cfg, out, batch)
        return total, tb

    (total, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params']
    )
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in tb.values())
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)

    out = model.apply(variables, batch, False)
    pred = ssd3d_predict(cfg, out)
    K = out['head_out']['votes'].shape[1]
    assert pred['pred_boxes'].shape == (2, K, 7)
    assert pred['pred_scores'].shape == (2, K)
    assert np.all(np.asarray(pred['pred_labels']) >= 1)
