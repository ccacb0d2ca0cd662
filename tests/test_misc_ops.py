import jax.numpy as jnp
import numpy as np

from tmae_tpu.ops.chamfer import chamfer_distance
from tmae_tpu.ops.posembed import window_pos_embed
from tmae_tpu.ops.centernet import (
    gaussian_radius, assign_center_targets, topk_heatmap,
)
from tmae_tpu.config import Cfg, cfg_from_list


def test_chamfer_identity_zero():
    pts = jnp.asarray(np.random.RandomState(0).randn(4, 8, 3).astype(np.float32))
    loss = chamfer_distance(pts, pts, weights=jnp.ones((4,)))
    assert float(loss) < 1e-9


def test_chamfer_weighted():
    a = jnp.zeros((2, 4, 3))
    b = jnp.ones((2, 4, 3))
    w = jnp.asarray([1.0, 0.0])
    # each direction: mean min dist = 3.0 (squared L2), sum = 6; weight picks cloud 0
    loss = chamfer_distance(a, b, weights=w)
    assert np.allclose(float(loss), 6.0, atol=1e-5)


def test_pos_embed_shape_and_symmetry():
    pos = jnp.asarray(np.array([[[4.0, 4.0], [0.0, 0.0]]], np.float32))
    emb = window_pos_embed(pos, window=8, feat_dim=128)
    assert emb.shape == (1, 2, 128)
    # centered coordinate (4,4) → x=y=0 → sin parts zero, cos parts one
    e0 = np.asarray(emb[0, 0])
    assert np.allclose(e0[0::2], 0.0, atol=1e-6)
    assert np.allclose(e0[1::2], 1.0, atol=1e-6)


def test_gaussian_radius_reference_values():
    # torch reference formula evaluated by hand for h=w=10, overlap=0.1
    h = jnp.asarray(10.0)
    w = jnp.asarray(10.0)
    r = float(gaussian_radius(h, w, 0.1))
    # r1 = (20+sqrt(400-4*100*0.9/1.1))/2, r2=(40+sqrt(1600-16*0.9*100))/8... use
    # direct numpy recomputation:
    b1, c1 = 20.0, 100 * 0.9 / 1.1
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * c1)) / 2
    b2, c2 = 40.0, 0.9 * 100
    r2 = (b2 + np.sqrt(b2 ** 2 - 16 * c2)) / 2
    a3, b3, c3 = 0.4, -2 * 0.1 * 20, -0.9 * 100
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    assert np.allclose(r, min(r1, r2, r3), atol=1e-3)


def test_assign_center_targets():
    # one box at origin of a 32x32 grid, range [-5.12, 5.12], voxel 0.32
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0] = [0.0, 0.0, 0.5, 2.0, 2.0, 1.5, 0.3, 1.0]  # class 1
    gt[0, 1] = [2.0, -2.0, 0.0, 1.0, 1.0, 1.0, 0.0, 3.0]  # class 3
    mask = np.array([[True, True, False]])
    out = assign_center_targets(
        jnp.asarray(gt), jnp.asarray(mask), num_classes=3,
        feature_map_size=(32, 32),
        point_cloud_range=(-5.12, -5.12, -5.0, 5.12, 5.12, 3.0),
        voxel_size=(0.32, 0.32, 8.0),
    )
    hm = np.asarray(out['heatmap'][0])
    assert hm.shape == (3, 32, 32)
    # center cell of box 0: x = (0+5.12)/0.32 = 16 → peak 1.0 at class 0
    assert np.isclose(hm[0, 16, 16], 1.0)
    assert hm[1].max() == 0.0
    assert np.isclose(hm[2, 9, 22], 1.0)  # x=(2+5.12)/.32=22.25→22, y=(−2+5.12)/.32=9.75→9
    tb = np.asarray(out['target_boxes'][0])
    assert np.allclose(tb[0, 0:2], [0.0, 0.0], atol=1e-5)  # exact cell center offset
    assert np.allclose(tb[0, 3:6], np.log([2.0, 2.0, 1.5]), atol=1e-4)
    assert np.allclose(tb[0, 6:8], [np.cos(0.3), np.sin(0.3)], atol=1e-5)
    inds = np.asarray(out['inds'][0])
    assert inds[0] == 16 * 32 + 16
    assert np.asarray(out['mask'][0]).tolist() == [True, True, False]


def test_topk_heatmap():
    hm = np.zeros((1, 2, 8, 8), np.float32)
    hm[0, 0, 2, 3] = 0.9
    hm[0, 1, 5, 5] = 0.8
    hm[0, 0, 7, 1] = 0.7
    s, c, i, ys, xs = topk_heatmap(jnp.asarray(hm), K=3)
    assert np.allclose(np.asarray(s[0]), [0.9, 0.8, 0.7])
    assert np.asarray(c[0]).tolist() == [0, 1, 0]
    assert np.asarray(ys[0]).tolist() == [2.0, 5.0, 7.0]
    assert np.asarray(xs[0]).tolist() == [3.0, 5.0, 1.0]


def test_config_overrides(tmp_path):
    base = tmp_path / 'base.yaml'
    base.write_text('A: 1\nB:\n  C: 2\n  D: [1, 2]\n')
    child = tmp_path / 'child.yaml'
    child.write_text(f"_BASE_CONFIG_: {base}\nB:\n  C: 5\nE: hello\n")
    from tmae_tpu.config import cfg_from_yaml_file
    cfg = cfg_from_yaml_file(child)
    assert cfg.A == 1 and cfg.B.C == 5 and cfg.B.D == [1, 2] and cfg.E == 'hello'
    cfg = cfg_from_list(['B.C', '9', 'A', '7'], cfg)
    assert cfg.B.C == 9 and cfg.A == 7
