import jax
import jax.numpy as jnp
import numpy as np

from tmae_tpu.models.anchor_head import assign_atss_targets
from tmae_tpu.models.point_part_head import (
    PointIntraPartOffsetHead, point_part_loss, point_part_targets,
)
from tmae_tpu.ops.box_coder import ResidualCoder


def test_point_part_targets():
    pts = jnp.asarray([[[0.5, 0.0, 0.0],     # inside, +x quarter
                        [1.3, 0.0, 0.0],     # in enlarged band only → ignore
                        [9.0, 9.0, 9.0]]])   # background
    pmask = jnp.ones((1, 3), bool)
    gt = jnp.asarray([[[0, 0, 0, 2.0, 2.0, 2.0, 0.0, 2.0]]])
    gmask = jnp.ones((1, 1), bool)
    labels, part, box = point_part_targets(pts, pmask, gt, gmask,
                                           extra_width=(1.0, 1.0, 1.0))
    assert labels[0].tolist() == [2, -1, 0]
    np.testing.assert_allclose(np.asarray(part[0, 0]), [0.75, 0.5, 0.5],
                               atol=1e-5)


def test_point_part_head_loss():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-3, 3, (2, 32, 3)).astype(np.float32))
    pmask = jnp.ones((2, 32), bool)
    gt = jnp.zeros((2, 2, 8)).at[:, 0].set(
        jnp.asarray([0, 0, 0, 2.5, 2.5, 2.5, 0.3, 1.0])
    )
    gmask = jnp.zeros((2, 2), bool).at[:, 0].set(True)
    cfg = {'CLS_FC': [16], 'PART_FC': [16],
           'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]}}
    head = PointIntraPartOffsetHead(cfg, num_class=3)
    v = head.init(jax.random.PRNGKey(0), feats, pmask, True)
    out, _ = head.apply(v, feats, pmask, True, mutable=['batch_stats'])
    assert out['point_part_preds'].shape == (2, 32, 3)
    assert out['point_cls_scores'].shape == (2, 32)
    total, tb = point_part_loss(out, pts, pmask, gt, gmask, cfg)
    assert np.isfinite(float(total))
    assert float(tb['point_part_loss']) >= 0


def test_atss_assigner():
    # grid of axis-aligned anchors, one gt sitting on a few of them
    xs, ys = np.meshgrid(np.arange(8, dtype=np.float32),
                         np.arange(8, dtype=np.float32))
    anchors = np.zeros((64, 7), np.float32)
    anchors[:, 0] = xs.ravel()
    anchors[:, 1] = ys.ravel()
    anchors[:, 3:6] = [2.0, 2.0, 1.5]
    gt = np.zeros((3, 8), np.float32)
    gt[0] = [3.0, 3.0, 0, 2.2, 2.1, 1.5, 0.0, 2]
    gt_mask = np.array([True, False, False])
    coder = ResidualCoder(code_size=7)
    labels, reg, w = assign_atss_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_mask),
        coder, topk=9,
    )
    labels = np.asarray(labels)
    # the anchor at the gt center must be positive with the gt's class
    assert labels[3 * 8 + 3] == 2
    # positives only near the gt; anchors far away are background
    assert labels[0] == 0 and labels[63] == 0
    pos = labels > 0
    assert pos.sum() >= 1
    assert np.all(np.asarray(w)[pos] == 1.0)
    assert np.all(np.isfinite(np.asarray(reg)[pos]))
    # all-padding gts → everything background
    labels2, _, w2 = assign_atss_targets(
        jnp.asarray(anchors), jnp.asarray(gt),
        jnp.zeros(3, bool), coder, topk=9,
    )
    assert np.all(np.asarray(labels2) == 0) and float(w2.sum()) == 0.0
