import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.tiny_cfg import tiny_cfg, synth_batch
from tmae_tpu.models.detectors import (
    build_detector, centerpoint_loss, centerpoint_predict, tmae_loss,
)


@pytest.fixture(scope='module')
def cp_setup():
    cfg = tiny_cfg(mae=False)
    model = build_detector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synth_batch(np.random.RandomState(0)).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, batch, variables


def test_centerpoint_forward_eval(cp_setup):
    cfg, model, batch, variables = cp_setup
    out = model.apply(variables, batch, train=False)
    pd = out['pred_dicts'][0]
    assert pd['hm'].shape == (2, 32, 32, 5)
    assert pd['center'].shape == (2, 32, 32, 2)
    assert out['spatial_features_2d'].shape == (2, 32, 32, 16)
    for v in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(v)))
    boxes, scores, labels, valid = centerpoint_predict(cfg, out)
    assert boxes.shape == (2, 32, 7)
    assert np.all(np.isfinite(np.asarray(boxes)))
    lab = np.asarray(labels)
    assert lab.min() >= 1 and lab.max() <= 5


@pytest.mark.slow
def test_centerpoint_train_loss_and_grad(cp_setup):
    cfg, model, batch, variables = cp_setup

    def loss_fn(params):
        out, new_state = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, train=True, mutable=['batch_stats'],
        )
        loss, tb = centerpoint_loss(cfg, out, batch)
        return loss, tb

    (loss, tb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params']
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_tmae_forward_and_loss():
    cfg = tiny_cfg(mae=True)
    model = build_detector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synth_batch(np.random.RandomState(1)).items()}
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'mae_mask': jax.random.PRNGKey(1)},
        batch, train=True,
    )
    out = model.apply(
        variables, batch, train=True,
        rngs={'mae_mask': jax.random.PRNGKey(2)},
        mutable=['batch_stats'],
    )[0]
    assert out['pred_points'].shape == (2, 128, 8, 3)
    assert out['gt_points'].shape == (2, 128, 16, 3)
    w = np.asarray(out['loss_weights'])
    # ~75% of valid voxels masked
    nvalid = w.shape[1]
    assert w.sum() > 0
    loss, _ = tmae_loss(cfg, out, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # mask ratio sanity: masked fraction of valid voxels ≈ 0.75
    mm = np.asarray(out['mae_mask'])
    # count valid voxels from weights > -1 trick: weights = mask*valid
    frac = w.sum() / np.maximum((mm >= 0).sum(), 1)
    # can't recover exact valid count here; just check masked count positive and
    # less than total slots
    assert 0 < w.sum() < mm.size


def test_mae_mask_ratio():
    from tmae_tpu.models.siamwca import random_voxel_mask
    rng = jax.random.PRNGKey(0)
    vmask = jnp.asarray(np.array([[True] * 80 + [False] * 48]))
    nvox = jnp.asarray([80])
    mm = np.asarray(random_voxel_mask(rng, vmask, nvox, 0.75))
    assert mm.shape == (1, 128)
    assert mm[0, 80:].sum() == 0  # invalid slots never masked
    # len_keep = int(80*0.25) = 20 → 60 masked
    assert mm[0, :80].sum() == 60


def test_gather_gt_points_wraps():
    from tmae_tpu.models.siamwca import gather_gt_points
    pts = jnp.asarray(
        np.array([[[0.0, 0, 0], [1, 1, 1], [2, 2, 2], [9, 9, 9]]], np.float32)
    )
    pv = jnp.asarray(np.array([[0, 0, 1, 3]], np.int32))  # voxel 0: 2 pts, voxel 1: 1
    pvalid = jnp.asarray(np.array([[True, True, True, False]]))
    out = np.asarray(gather_gt_points(pts, pv, pvalid, V=3, K=4))
    assert out.shape == (1, 3, 4, 3)
    # voxel 0 wraps [p0, p1, p0, p1]
    assert np.allclose(out[0, 0, :, 0], [0, 1, 0, 1])
    # voxel 1 repeats p2
    assert np.allclose(out[0, 1, :, 0], [2, 2, 2, 2])


def test_temporal_vfe_batched_eval_matches_sequential():
    """TemporalDynVFE == the two per-frame encoder calls (pins the
    composition whatever execution strategy the module picks), and
    prev_needed=False (streaming) must reproduce the cur frame."""
    from tmae_tpu.models.detectors import make_voxel_spec
    from tmae_tpu.models.vfe import TemporalDynVFE

    cfg = tiny_cfg(mae=False)
    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    batch = synth_batch(np.random.RandomState(3))
    vfe = TemporalDynVFE(spec, mlps=[[32, 64]])
    args = (jnp.asarray(batch['points']), jnp.asarray(batch['point_mask']),
            jnp.asarray(batch['points_prev']),
            jnp.asarray(batch['point_mask_prev']))
    params = vfe.init(jax.random.PRNGKey(0), *args, False)
    cur_b, prv_b = vfe.apply(params, *args, False)
    # true sequential per-frame calls on the shared encoder (the train-path
    # composition), bypassing the batched fast path
    one = lambda p, m: vfe.apply(
        params, p, m, False,
        method=lambda mod, pp, mm, tr: mod.encoder(pp, mm, tr))
    cur_s = one(args[0], args[1])
    prv_s = one(args[2], args[3])
    for k in cur_b:
        np.testing.assert_allclose(np.asarray(cur_b[k], np.float32),
                                   np.asarray(cur_s[k], np.float32),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(prv_b[k], np.float32),
                                   np.asarray(prv_s[k], np.float32),
                                   atol=1e-5, rtol=1e-5)
    cur_only, _ = vfe.apply(params, *args, False, prev_needed=False)
    for k in cur_b:
        np.testing.assert_allclose(np.asarray(cur_only[k], np.float32),
                                   np.asarray(cur_b[k], np.float32),
                                   atol=1e-5, rtol=1e-5)
