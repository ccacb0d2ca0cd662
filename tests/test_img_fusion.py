import jax
import jax.numpy as jnp
import numpy as np

from tmae_tpu.models.dla import DLASeg
from tmae_tpu.models.point_sample import point_sample, points_lidar2img


def test_points_lidar2img():
    # camera looking down +x in lidar frame: x_cam = -y_l, y_cam = -z_l,
    # z_cam = x_l; intrinsics f=100, c=(50, 50)
    l2c = np.array([[0, -1, 0, 0],
                    [0, 0, -1, 0],
                    [1, 0, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    K = np.array([[100, 0, 50, 0],
                  [0, 100, 50, 0],
                  [0, 0, 1, 0]], np.float32)
    proj = K @ l2c
    pts = jnp.asarray([[10.0, 0.0, 0.0],     # on axis → principal point
                       [10.0, -1.0, 0.0]])   # 1 m right → +10 px in x
    uv, depth = points_lidar2img(pts, jnp.asarray(proj))
    np.testing.assert_allclose(np.asarray(uv[0]), [50, 50], atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[1]), [60, 50], atol=1e-4)
    assert np.allclose(np.asarray(depth), 10.0)


def test_point_sample_values_and_bounds():
    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                    [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    K = np.array([[100, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]], np.float32)
    H, W, stride = 100, 100, 4
    # feature map whose value encodes its own (y, x) position
    yy, xx = np.meshgrid(np.arange(H // stride), np.arange(W // stride),
                         indexing='ij')
    feats = np.stack([yy, xx], -1).astype(np.float32)[None]
    pts = jnp.asarray([[[10.0, 0.0, 0.0],      # principal point (50, 50)
                        [10.0, 0.0, 50.0],     # far above the image → invalid
                        [-5.0, 0.0, 0.0]]])    # behind the camera → invalid
    out, valid = point_sample(
        pts, jnp.asarray(feats), jnp.asarray(l2c)[None],
        jnp.asarray(K)[None], (H, W), feat_stride=stride,
    )
    assert np.asarray(valid)[0].tolist() == [True, False, False]
    np.testing.assert_allclose(np.asarray(out[0, 0]), [50 / 4, 50 / 4],
                               atol=1e-4)
    assert np.all(np.asarray(out[0, 1:]) == 0)


def test_point_sample_undoes_world_aug():
    l2c = np.eye(4, dtype=np.float32)
    K = np.array([[100, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]], np.float32)
    yy, xx = np.meshgrid(np.arange(25), np.arange(25), indexing='ij')
    feats = np.stack([yy, xx], -1).astype(np.float32)[None]
    pts = np.array([[[0.5, -0.3, 10.0]]], np.float32)
    # augment: rotate by 0.3 around z
    c, s = np.cos(0.3), np.sin(0.3)
    M = np.eye(4, dtype=np.float32)
    M[0, 0], M[0, 1], M[1, 0], M[1, 1] = c, -s, s, c
    aug_pts = pts.copy()
    aug_pts[0, :, :3] = pts[0, :, :3] @ M[:3, :3].T
    ref, _ = point_sample(jnp.asarray(pts), jnp.asarray(feats),
                          jnp.asarray(l2c)[None], jnp.asarray(K)[None],
                          (100, 100), 4)
    out, _ = point_sample(jnp.asarray(aug_pts), jnp.asarray(feats),
                          jnp.asarray(l2c)[None], jnp.asarray(K)[None],
                          (100, 100), 4,
                          aug_inverse=jnp.asarray(np.linalg.inv(M))[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dlaseg_forward():
    model = DLASeg({'DOWN_RATIO': 4, 'LAST_LEVEL': 5})
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(v, x, False)
    assert out.shape == (1, 16, 16, 64)  # stride 4, channels[first_level]=64
    out2, _ = model.apply(v, x, True, mutable=['batch_stats'])
    assert np.all(np.isfinite(np.asarray(out2)))


def test_graph_rcnn_head_with_image_branch():
    from tmae_tpu.models.graph_rcnn import GraphRCNNHead

    cfg = {
        'DFVS_CONFIG': {'NUM_DVS_POINTS': 8, 'NUM_FPS_POINTS': 4,
                        'POOL_EXTRA_WIDTH': 0.5},
        'ATTN_GNN_CONFIG': {'K': 3, 'MLPS': [8], 'CALIB_DIM': 8,
                            'EXP_MLPS': [16], 'OUT_DIM': 16,
                            'USE_REDUCTION': True, 'USE_SHORT_CUT': False,
                            'USE_FEATS_DIS': False},
        'TARGET_CONFIG': {'BOX_CODER_CONFIG': {'code_size': 7}},
        'IMG_CONFIG': {'MLPS': [4], 'FEAT_STRIDE': 4},
    }
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-4, 4, (1, 64, 4)).astype(np.float32))
    pmask = jnp.ones((1, 64), bool)
    rois = jnp.asarray(np.array(
        [[[0, 0, 0, 3, 3, 3, 0.2], [2, 2, 0, 3, 3, 3, -0.1]]], np.float32))
    rmask = jnp.ones((1, 2), bool)
    l2c = np.eye(4, dtype=np.float32)[None]
    K = np.array([[[100, 0, 50, 0], [0, 100, 50, 0], [0, 0, 1, 0]]],
                 np.float32)
    image_inputs = {
        'image_features': jnp.asarray(
            rng.randn(1, 25, 25, 8).astype(np.float32)),
        'trans_lidar_to_cam': jnp.asarray(l2c),
        'trans_cam_to_img': jnp.asarray(K),
        'image_shape': (100, 100),
        'aug_inverse': None,
    }
    head = GraphRCNNHead(cfg, num_class=1)
    v = head.init(jax.random.PRNGKey(0), pts, pmask, rois, rmask, False,
                  image_inputs=image_inputs)
    cls, reg = head.apply(v, pts, pmask, rois, rmask, False,
                          image_inputs=image_inputs)
    assert cls.shape == (1, 2, 1) and reg.shape == (1, 2, 7)
    assert 'img_conv0' in v['params']
