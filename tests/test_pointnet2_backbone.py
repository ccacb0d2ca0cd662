import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.config import Cfg
from tmae_tpu.models.pointnet2_backbone import (
    PointNet2Backbone, PointHeadSimple, point_head_targets,
)


@pytest.mark.slow
def test_pointnet2_backbone_forward():
    cfg = Cfg.from_dict({
        'SA_CONFIG': {
            'NPOINTS': [32, 8],
            'RADIUS': [[0.5, 1.0], [1.0, 2.0]],
            'NSAMPLE': [[8, 16], [8, 16]],
            'MLPS': [[[8, 8], [8, 16]], [[16, 16], [16, 32]]],
        },
        'FP_MLPS': [[16, 16], [16, 16]],
    })
    rng = np.random.RandomState(0)
    N = 128
    xyz = jnp.asarray(rng.uniform(-4, 4, (2, N, 3)).astype(np.float32))
    mask = np.ones((2, N), bool)
    mask[1, 100:] = False
    mask = jnp.asarray(mask)
    feats = jnp.asarray(rng.randn(2, N, 4).astype(np.float32))
    model = PointNet2Backbone(cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats, False)
    out = model.apply(variables, xyz, mask, feats, False)
    assert out['point_features'].shape == (2, N, 16)
    assert np.all(np.isfinite(np.asarray(out['point_features'])))
    # invalid points produce zero features
    pf = np.asarray(out['point_features'][1])
    assert np.abs(pf[100:]).max() == 0.0


def test_point_head_simple_and_targets():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 32, 16).astype(np.float32))
    mask = jnp.asarray(np.ones((1, 32), bool))
    head = PointHeadSimple(Cfg.from_dict({'CLS_FC': [16]}), num_class=3)
    variables = head.init(jax.random.PRNGKey(0), feats, mask, False)
    logits = head.apply(variables, feats, mask, False)
    assert logits.shape == (1, 32, 3)

    pts = jnp.asarray(np.array(
        [[[0.0, 0, 0], [5, 5, 0], [0.5, 0, 0.2]]], np.float32))
    pmask = jnp.asarray(np.ones((1, 3), bool))
    boxes = np.zeros((1, 2, 8), np.float32)
    boxes[0, 0] = [0, 0, 0, 2, 2, 1.5, 0.0, 2]  # class 2
    bmask = jnp.asarray(np.array([[True, False]]))
    labels = np.asarray(point_head_targets(pts, pmask, jnp.asarray(boxes),
                                           bmask))
    assert labels[0].tolist() == [2, 0, 2]
