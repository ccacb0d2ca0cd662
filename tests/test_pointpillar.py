import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.models.detectors import build_detector
from tmae_tpu.models.anchor_head import anchor_head_loss, anchor_head_predict

CLASS_NAMES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']


def _cfg():
    return Cfg.from_dict({
        'CLASS_NAMES': CLASS_NAMES,
        'DATA_CONFIG': {
            'DATASET': 'SyntheticONCEDataset',
            'POINT_CLOUD_RANGE': [-5.12, -5.12, -5.0, 5.12, 5.12, 3.0],
            'DATA_SPLIT': {'train': 'train', 'test': 'val'},
            'NUM_SYNTHETIC_SAMPLES': 2,
            'SYNTHETIC_POINTS': 512,
            'SYNTHETIC_BOXES': 3,
            'DATA_PROCESSOR': [
                {'NAME': 'mask_points_and_boxes_outside_range',
                 'REMOVE_OUTSIDE_BOXES': True},
                {'NAME': 'transform_points_to_voxels',
                 'VOXEL_SIZE': [0.32, 0.32, 8.0],
                 'MAX_POINTS_PER_VOXEL': 8,
                 'MAX_NUMBER_OF_VOXELS': {'train': 128, 'test': 128}},
            ],
        },
        'MODEL': {
            'NAME': 'PointPillar',
            'VFE': {'NAME': 'PillarVFE', 'NUM_FILTERS': [16]},
            'BACKBONE_2D': {
                'NAME': 'BaseBEVBackbone',
                'LAYER_NUMS': [2, 2],
                'LAYER_STRIDES': [2, 2],
                'NUM_FILTERS': [16, 32],
                'UPSAMPLE_STRIDES': [1, 2],
                'NUM_UPSAMPLE_FILTERS': [16, 16],
            },
            'DENSE_HEAD': {
                'NAME': 'AnchorHeadSingle',
                'ANCHOR_GENERATOR_CONFIG': [
                    {'class_name': c, 'anchor_sizes': [[4.0, 2.0, 1.6]],
                     'anchor_rotations': [0, 1.57],
                     'anchor_bottom_heights': [-1.78],
                     'align_center': False, 'feature_map_stride': 2,
                     'matched_threshold': 0.5, 'unmatched_threshold': 0.35}
                    for c in CLASS_NAMES
                ],
                'TARGET_ASSIGNER_CONFIG': {'BOX_CODER_CONFIG': {}},
                'USE_DIRECTION_CLASSIFIER': False,
                'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                    'cls_weight': 1.0, 'loc_weight': 2.0,
                    'code_weights': [1.0] * 7}},
            },
        },
        'RUNTIME': {'MAX_POINTS': 768, 'MAX_VOXELS': [128], 'MAX_GT': 8},
        'OPTIMIZATION': {'BATCH_SIZE_PER_GPU': 2, 'NUM_EPOCHS': 1,
                         'OPTIMIZER': 'adam_onecycle', 'LR': 1e-3,
                         'WEIGHT_DECAY': 0.01, 'MOMS': [0.95, 0.85],
                         'PCT_START': 0.4, 'DIV_FACTOR': 10,
                         'GRAD_NORM_CLIP': 10},
    })


@pytest.mark.slow
def test_pointpillar_forward_and_loss():
    cfg = _cfg()
    ds, loader = build_dataloader(
        cfg.DATA_CONFIG, CLASS_NAMES, batch_size=2, training=True,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    assert batch['voxels'].shape[1] == 128
    model = build_detector(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != 'frame_id'}
    variables = model.init(jax.random.PRNGKey(0), jbatch, train=False)
    out = model.apply(variables, jbatch, train=False)
    assert out['spatial_features_2d'].shape[0] == 2
    # loss via bound head
    head_mod = model.bind(variables)
    # rebuild a standalone head to reuse pure loss fns
    from tmae_tpu.models.anchor_head import AnchorHeadSingle
    nx, ny, _ = model.spec.grid_size
    head = AnchorHeadSingle(
        model_cfg=cfg.MODEL.DENSE_HEAD, num_class=5,
        class_names=tuple(CLASS_NAMES), grid_size=(nx, ny),
        pc_range=model.spec.pc_range,
    )
    hv = {'params': variables['params']['dense_head']}
    targets = head.apply(hv, jbatch['gt_boxes'], jbatch['gt_mask'],
                         method=AnchorHeadSingle.assign_targets)
    loss, tb = anchor_head_loss(
        head.bind(hv), out['anchor_outputs'], targets,
        cfg.MODEL.DENSE_HEAD.LOSS_CONFIG,
    )
    assert np.isfinite(float(loss))
    cls_preds, boxes = anchor_head_predict(head.bind(hv), out['anchor_outputs'])
    assert np.all(np.isfinite(np.asarray(boxes)))
