"""Tiny model/data configs shared by the tests: 32x32 grid, small channel widths,
same structure as tools/cfgs/once_models/t_mae{,_ssl}.yaml."""

import numpy as np

from tmae_tpu.config import Cfg

CLASS_NAMES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']

PC_RANGE = [-5.12, -5.12, -5.0, 5.12, 5.12, 3.0]
VOXEL_SIZE = [0.32, 0.32, 8.0]


def _drop_info():
    return {
        'train': {
            '0': {'max_tokens': 16, 'drop_range': [0, 16]},
            '1': {'max_tokens': 32, 'drop_range': [16, 32]},
            '2': {'max_tokens': 64, 'drop_range': [32, 100000]},
        },
        'test': {
            '0': {'max_tokens': 16, 'drop_range': [0, 16]},
            '1': {'max_tokens': 32, 'drop_range': [16, 32]},
            '2': {'max_tokens': 64, 'drop_range': [32, 100000]},
        },
    }


def _sst_block(name, stride, d_model):
    return {
        'NAME': name,
        'PREPROCESS': {
            'WINDOW_SHAPE': [8, 8, 1],
            'DROP_INFO': _drop_info(),
            'SHUFFLE_VOXELS': False,
            'POS_TEMPERATURE': 1000,
            'NORMALIZE_POS': False,
        },
        'ENCODER': {
            'NUM_BLOCKS': 1,
            'STRIDE': stride,
            'D_MODEL': d_model,
            'NHEAD': 4,
            'DIM_FEEDFORWARD': 2 * d_model,
            'DROPOUT': 0.0,
            'ACTIVATION': 'gelu',
            'LAYER_CFG': {'cosine': True, 'tau_min': 0.01},
        },
    }


def backbone3d_cfg(mae: bool):
    cfg = {
        'NAME': 'SiamWCA_MAE' if mae else 'SiamWCA',
        'SST_BLOCK_LIST': [
            _sst_block('sst_block_x1', 1, 16),
            _sst_block('sst_block_x2', 2, 32),
            _sst_block('sst_block_x4', 2, 32),
        ],
        'FEATURES_SOURCE': ['x_conv1', 'x_conv2', 'x_conv3'],
        'FUSE_LAYER': {
            'x_conv1': {'UPSAMPLE_STRIDE': 1, 'NUM_FILTER': 16,
                        'NUM_UPSAMPLE_FILTER': 16},
            'x_conv2': {'UPSAMPLE_STRIDE': 2, 'NUM_FILTER': 32,
                        'NUM_UPSAMPLE_FILTER': 16},
            'x_conv3': {'UPSAMPLE_STRIDE': 4, 'NUM_FILTER': 32,
                        'NUM_UPSAMPLE_FILTER': 16},
        },
    }
    if mae:
        cfg['MASK_CONFIG'] = {
            'RATIO': 0.75, 'NUM_PRD_POINTS': 8, 'NUM_GT_POINTS': 16,
        }
    return cfg


def tiny_cfg(mae: bool = False) -> Cfg:
    model = {
        'NAME': 'TMAE' if mae else 'CenterPoint',
        'VFE': {
            'NAME': 'TemporalDynVFE', 'TYPE': 'mean', 'WITH_DISTANCE': False,
            'USE_ABSLOTE_XYZ': True, 'USE_CLUSTER_XYZ': True, 'MLPS': [[8, 16]],
            'FT': not mae,
        },
        'BACKBONE_3D': backbone3d_cfg(mae),
    }
    if not mae:
        model['BACKBONE_2D'] = {
            'NAME': 'SSTBEVBackbone',
            'NUM_FILTER': 16,
            'CONV_KWARGS': [
                {'out_channels': 16, 'kernel_size': 3, 'dilation': 1,
                 'padding': 1, 'stride': 1},
                {'out_channels': 16, 'kernel_size': 3, 'dilation': 2,
                 'padding': 2, 'stride': 1},
            ],
            'CONV_SHORTCUT': [0, 1],
        }
        model['DENSE_HEAD'] = {
            'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
            'CLASS_NAMES_EACH_HEAD': [CLASS_NAMES],
            'SHARED_CONV_CHANNEL': 16,
            'USE_BIAS_BEFORE_NORM': True,
            'NUM_HM_CONV': 2,
            'SEPARATE_HEAD_CFG': {
                'HEAD_ORDER': ['center', 'center_z', 'dim', 'rot'],
                'HEAD_DICT': {
                    'center': {'out_channels': 2, 'num_conv': 2},
                    'center_z': {'out_channels': 1, 'num_conv': 2},
                    'dim': {'out_channels': 3, 'num_conv': 2},
                    'rot': {'out_channels': 2, 'num_conv': 2},
                },
            },
            'TARGET_ASSIGNER_CONFIG': {
                'FEATURE_MAP_STRIDE': 1, 'NUM_MAX_OBJS': 32,
                'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2,
            },
            'LOSS_CONFIG': {
                'LOSS_WEIGHTS': {
                    'cls_weight': 1.0, 'loc_weight': 2.0,
                    'code_weights': [1.0] * 8,
                },
            },
            'POST_PROCESSING': {
                'SCORE_THRESH': 0.1,
                'POST_CENTER_LIMIT_RANGE': PC_RANGE,
                'MAX_OBJ_PER_SAMPLE': 32,
                'NMS_CONFIG': {
                    'NMS_TYPE': 'nms_gpu', 'NMS_THRESH': 0.5,
                    'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                },
            },
        }
    return Cfg.from_dict({
        'CLASS_NAMES': CLASS_NAMES,
        'DATA_CONFIG': {
            'POINT_CLOUD_RANGE': PC_RANGE,
            'DATA_PROCESSOR': [
                {'NAME': 'mask_points_and_boxes_outside_range',
                 'REMOVE_OUTSIDE_BOXES': True},
                {'NAME': 'shuffle_points',
                 'SHUFFLE_ENABLED': {'train': True, 'test': False}},
                {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': VOXEL_SIZE},
            ],
        },
        'MODEL': model,
        'RUNTIME': {
            'MAX_POINTS': 256,
            'MAX_VOXELS': [128, 96, 64],
            'MAX_GT': 16,
            # exercise the token-bucketed compaction path (the production
            # config) in the driver dryrun / tiny e2e tests
            'OCC_WINDOW_CAPS': [16, 16, 16],
            'OCC_SMALL_CAPS': [32, 32, 32],
            'OCC_SMALL_TOKENS': 16,
        },
        'OPTIMIZATION': {
            'BATCH_SIZE_PER_GPU': 2, 'NUM_EPOCHS': 2,
            'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
            'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
            'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
            'LR_CLIP': 1e-7, 'DECAY_STEP_LIST': [35, 45], 'LR_DECAY': 0.1,
            'LR_WARMUP': False, 'WARMUP_EPOCH': 1,
        },
    })


def synth_batch(rng: np.random.RandomState, B=2, P=256, M=16, n_real=180,
                n_gt=3):
    """Synthetic two-frame batch with a few box-shaped clusters."""
    pts = np.zeros((B, P, 4), np.float32)
    pmask = np.zeros((B, P), bool)
    pts_prev = np.zeros((B, P, 4), np.float32)
    pmask_prev = np.zeros((B, P), bool)
    gt = np.zeros((B, M, 8), np.float32)
    gmask = np.zeros((B, M), bool)
    for b in range(B):
        base = rng.uniform(-4.5, 4.5, (n_real, 2))
        z = rng.uniform(-1.0, 1.0, (n_real, 1))
        inten = rng.uniform(0, 1, (n_real, 1))
        pts[b, :n_real] = np.concatenate([base, z, inten], -1)
        pmask[b, :n_real] = True
        shiftd = base + rng.uniform(-0.3, 0.3, base.shape)
        pts_prev[b, :n_real] = np.concatenate([shiftd, z, inten], -1)
        pmask_prev[b, :n_real] = True
        for g in range(n_gt):
            cx, cy = rng.uniform(-3.5, 3.5, 2)
            gt[b, g] = [cx, cy, 0.0, rng.uniform(0.8, 2.0),
                        rng.uniform(0.8, 2.0), 1.5,
                        rng.uniform(-np.pi, np.pi), rng.randint(1, 6)]
            gmask[b, g] = True
    return {
        'points': pts, 'point_mask': pmask,
        'points_prev': pts_prev, 'point_mask_prev': pmask_prev,
        'gt_boxes': gt, 'gt_mask': gmask,
    }
