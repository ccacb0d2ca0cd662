"""Camera data pipeline: image ops (numpy equivalents of the reference's cv2
processors, data_processor.py:174-266), photo_metric_distortion, ONCE image +
calib loading, and a file-backed GraphRCNN forward consuming images from the
dataset layer (VERDICT round 1, item 4)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from once_fixture import CAM, CLASSES, make_raw_once

from tmae_tpu.datasets import image_ops as io


def test_imresize_matches_pil_bilinear_upscale():
    """PIL's BILINEAR equals cv2's INTER_LINEAR (half-pixel centers) for
    upscaling; downscale differs because PIL area-averages — the cv2 behavior
    is what the reference uses and what we implement."""
    from PIL import Image

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)
    ours = io.imresize_bilinear(img, 60, 40).astype(np.float32)
    ref = np.asarray(
        Image.fromarray(img).resize((60, 40), Image.BILINEAR), np.float32)
    assert np.abs(ours - ref).max() <= 2.0  # rounding differences only


def test_imresize_identity_and_2x():
    rng = np.random.RandomState(4)
    img = rng.rand(8, 6, 3).astype(np.float32)
    np.testing.assert_allclose(io.imresize_bilinear(img, 6, 8), img, atol=1e-6)
    up = io.imresize_bilinear(img, 12, 16)
    # hand-computed interior sample: output (3,3) sits at source (1.25, 1.25)
    assert np.abs(
        up[3, 3] - (0.5625 * img[1, 1] + 0.1875 * (img[1, 2] + img[2, 1])
                    + 0.0625 * img[2, 2])
    ).max() < 1e-5


def test_imrescale_keep_ratio_and_scale_factors():
    rng = np.random.RandomState(1)
    img = rng.rand(40, 60, 3).astype(np.float32)
    out, (ws, hs) = io.imrescale(img, [(30, 20)], True, rng)
    # keep_ratio: scale = min(30/60, 20/40) = 0.5
    assert out.shape[:2] == (20, 30)
    assert abs(ws - 0.5) < 1e-6 and abs(hs - 0.5) < 1e-6
    out2, _ = io.imrescale(img, [(30, 20)], False, rng)
    assert out2.shape[:2] == (20, 30)


def test_imflip_imnormalize_impad():
    rng = np.random.RandomState(2)
    img = rng.rand(10, 12, 3).astype(np.float32)
    assert np.allclose(io.imflip(img)[:, ::-1], img)
    norm = io.imnormalize(img, [0.1, 0.2, 0.3], [1.0, 2.0, 4.0], to_rgb=False)
    assert np.allclose(norm[..., 1], (img[..., 1] - 0.2) / 2.0, atol=1e-6)
    norm_rgb = io.imnormalize(img, [0.0, 0.0, 0.0], [1, 1, 1], to_rgb=True)
    assert np.allclose(norm_rgb[..., 0], img[..., 2])
    pad = io.impad(img, 32)
    assert pad.shape == (32, 32, 3)
    assert np.allclose(pad[:10, :12], img) and pad[10:].sum() == 0


def test_hsv_roundtrip_and_distortion():
    rng = np.random.RandomState(3)
    img = rng.rand(8, 8, 3).astype(np.float32)
    back = io.hsv_to_bgr(io.bgr_to_hsv(img))
    assert np.abs(back - img).max() < 1e-5
    out = io.photo_metric_distortion(
        img, {'BRIGHTNESS_DELTA': 0.1, 'CONTRAST_RANGE': (0.8, 1.2),
              'SATURATION_RANGE': (0.8, 1.2), 'HUE_DELTA': 18}, rng)
    assert out.shape == img.shape and np.isfinite(out).all()


def _camera_dataset(root, training=False):
    from tmae_tpu.config import Cfg
    from tmae_tpu.datasets.dataset import build_dataloader

    cfg = Cfg.from_dict({
        'DATASET': 'ONCEDataset',
        'POINT_CLOUD_RANGE': [-32.0, -32.0, -5.0, 32.0, 32.0, 3.0],
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'CAMERA_CONFIG': {'USE_CAMERA': True, 'CAM_NAME': CAM},
        'DATA_PROCESSOR': [
            {'NAME': 'mask_points_and_boxes_outside_range',
             'REMOVE_OUTSIDE_BOXES': True},
            {'NAME': 'imrescale',
             'IMAGE_SCALES': {'train': [(48, 32)], 'test': [(48, 32)]},
             'KEEP_RATIO': False},
            {'NAME': 'imnormalize', 'MEAN': [103.5, 116.3, 123.7],
             'STD': [57.4, 57.1, 58.4], 'TO_RGB': False},
            {'NAME': 'impad', 'SIZE_DIVISOR': 32},
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [2.0, 2.0, 0.2],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 64, 'test': 64}},
        ],
    })
    runtime = {'MAX_POINTS': 512, 'MAX_VOXELS': [64], 'MAX_GT': 8}
    return build_dataloader(cfg, CLASSES, batch_size=2, training=training,
                            runtime_cfg=runtime, root_path=str(root), seed=0)


def test_once_camera_loading_and_collate(tmp_path):
    import create_once_infos as coi

    root = make_raw_once(tmp_path, with_camera=True)
    coi.create_infos(root, 'val')
    ds, loader = _camera_dataset(root)
    batch = next(iter(loader))
    assert batch['images'].shape == (2, 32, 64, 3)  # 32x48 impadded to /32
    assert batch['trans_lidar_to_cam'].shape == (2, 4, 4)
    assert batch['trans_cam_to_img'].shape == (2, 3, 4)
    assert np.isfinite(batch['images']).all()
    # a lidar point on +x in front of the camera projects into the image
    T = batch['trans_lidar_to_cam'][0]
    K = batch['trans_cam_to_img'][0]
    p = np.array([10.0, 0.0, 0.0, 1.0], np.float32)
    cam = T @ p
    uvw = K @ cam
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    assert uvw[2] > 0 and 0 <= u <= 96 and 0 <= v <= 64


@pytest.mark.slow
def test_graph_rcnn_consumes_dataset_images(tmp_path):
    """File-backed e2e: raw ONCE tree with camera → infos → dataset/collate →
    GraphRCNN forward with DLASeg image branch."""
    import jax
    import jax.numpy as jnp

    import create_once_infos as coi
    from test_graph_rcnn import SAMPLER_CFG  # reuse the tiny ROI config
    from tmae_tpu.config import Cfg
    from tmae_tpu.models.graph_rcnn import GraphRCNN
    from tmae_tpu.ops.voxelize import VoxelSpec

    root = make_raw_once(tmp_path, with_camera=True)
    coi.create_infos(root, 'val')
    ds, loader = _camera_dataset(root)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()
             if k != 'frame_id'}

    nx = ny = 32
    spec = VoxelSpec(voxel_size=(2.0, 2.0, 0.2),
                     pc_range=(-32.0, -32.0, -5.0, 32.0, 32.0, 3.0),
                     max_points=512, max_voxels=64)
    model_cfg = Cfg.from_dict({
        'BACKBONE_3D': {},
        'BACKBONE_2D': {
            'LAYER_NUMS': [1], 'LAYER_STRIDES': [1], 'NUM_FILTERS': [16],
            'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [16],
        },
        'DENSE_HEAD': {
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[4.0, 2.0, 1.6]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.0], 'align_center': False,
                 'feature_map_stride': 16, 'matched_threshold': 0.5,
                 'unmatched_threshold': 0.35}],
            'TARGET_ASSIGNER_CONFIG': {'BOX_CODER_CONFIG': {}},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0,
                'code_weights': [1.0] * 7}},
        },
        'IMG_BACKBONE': {'DOWN_RATIO': 4, 'LAST_LEVEL': 5},
        'ROI_HEAD': {
            'NMS_CONFIG': {
                'TRAIN': {'NMS_PRE_MAXSIZE': 16, 'NMS_THRESH': 0.8,
                          'NMS_POST_MAXSIZE': 8},
                'TEST': {'NMS_PRE_MAXSIZE': 16, 'NMS_THRESH': 0.7,
                         'NMS_POST_MAXSIZE': 8},
            },
            'TARGET_CONFIG': dict(SAMPLER_CFG, BOX_CODER='ResidualCoder'),
            'IMG_CONFIG': {'FEAT_STRIDE': 4},
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
    model = GraphRCNN(model_cfg=model_cfg, class_names=('Car',), spec=spec,
                      max_voxels_per_level=(64, 64, 64, 64))
    rngs = {'params': jax.random.PRNGKey(0),
            'proposal': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, False)
    out = model.apply(variables, batch, False,
                      rngs={'proposal': jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()
    assert np.isfinite(np.asarray(out['rcnn_reg'])).all()
    # the image branch's params exist (DLASeg ran from dataset-loaded images)
    assert 'img_backbone' in variables['params']
