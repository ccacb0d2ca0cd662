import jax.numpy as jnp
import numpy as np

from tmae_tpu.ops.voxelize import (
    VoxelSpec, voxelize, segment_mean, segment_max, scatter_to_grid,
    gather_from_grid, downsample_coords,
)

SPEC = VoxelSpec(
    pc_range=(-5.12, -5.12, -5.0, 5.12, 5.12, 3.0),
    voxel_size=(0.32, 0.32, 8.0),
    max_points=64,
    max_voxels=16,
)


def make_points(pts_xy):
    pts = np.zeros((1, SPEC.max_points, 4), np.float32)
    mask = np.zeros((1, SPEC.max_points), bool)
    for i, (x, y) in enumerate(pts_xy):
        pts[0, i] = [x, y, 0.0, 1.0]
        mask[0, i] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def test_grid_size():
    assert SPEC.grid_size == (32, 32, 1)


def test_voxelize_basic():
    # two points in the same pillar, one in another, one out of range
    pts, mask = make_points([(0.05, 0.05), (0.10, 0.20), (-1.0, -1.0), (99.0, 0.0)])
    out = voxelize(pts, mask, SPEC)
    assert int(out['num_voxels'][0]) == 2
    vm = np.asarray(out['voxel_mask'][0])
    assert vm.sum() == 2
    coords = np.asarray(out['voxel_coords'][0])
    # pillar of (0.05, 0.05): x=floor((0.05+5.12)/0.32)=16, y=16
    # pillar of (-1, -1): x=floor(4.12/0.32)=12, y=12
    got = {tuple(c) for c, m in zip(coords, vm) if m}
    assert got == {(16, 16), (12, 12)}
    pv = np.asarray(out['point_voxel'][0])
    assert pv[0] == pv[1]  # same pillar
    assert pv[2] != pv[0]
    assert pv[3] == SPEC.max_voxels  # out-of-range → OOB sentinel
    # deterministic ordering: voxel ids ascending (y*nx+x): (12,12)=396 < (16,16)=528
    assert tuple(coords[0]) == (12, 12)


def test_voxelize_overflow_cap():
    spec = VoxelSpec(SPEC.pc_range, SPEC.voxel_size, 64, 2)
    pts, mask = make_points([(-1.0, -1.0), (0.05, 0.05), (1.0, 1.0), (2.0, 2.0)])
    out = voxelize(pts, mask, spec)
    assert int(out['num_voxels'][0]) == 2
    pv = np.asarray(out['point_voxel'][0])
    # overflow points land on the OOB slot
    assert (pv[:4] == 2).sum() == 2


def test_segment_mean_max():
    feat = jnp.asarray(np.array([[[1.0], [3.0], [10.0], [0.0]]], np.float32))
    seg = jnp.asarray(np.array([[0, 0, 1, 3]], np.int32))  # 3 == num_segments → drop
    mean = segment_mean(feat, seg, 3)
    assert np.allclose(np.asarray(mean[0, :, 0]), [2.0, 10.0, 0.0])
    mx = segment_max(feat, seg, 3)
    assert np.allclose(np.asarray(mx[0, :, 0]), [3.0, 10.0, 0.0])


def test_grid_roundtrip():
    pts, mask = make_points([(0.05, 0.05), (-1.0, -1.0)])
    out = voxelize(pts, mask, SPEC)
    feat = jnp.asarray(np.arange(SPEC.max_voxels, dtype=np.float32)[None, :, None] + 1)
    grid = scatter_to_grid(feat, out['voxel_coords'], out['voxel_mask'], (32, 32))
    assert grid.shape == (1, 32, 32, 1)
    back = gather_from_grid(grid, out['voxel_coords'], out['voxel_mask'])
    valid = np.asarray(out['voxel_mask'][0])
    assert np.allclose(np.asarray(back[0])[valid], np.asarray(feat[0])[valid])
    assert np.asarray(grid).sum() == np.asarray(feat[0])[valid].sum()


def test_downsample_coords_matches_spconv_rule():
    # voxel at y=5 (odd) → output rows {2, 3}; x=4 (even) → {2}
    coords = jnp.asarray(np.array([[[5, 4], [0, 0]]], np.int32))
    mask = jnp.asarray(np.array([[True, False]]))
    new_c, new_m = downsample_coords(coords, mask, (32, 32), 8)
    got = {tuple(c) for c, m in zip(np.asarray(new_c[0]), np.asarray(new_m[0])) if m}
    assert got == {(2, 2), (3, 2)}


def test_voxelize_host_matches_device():
    """voxelize_host (the RUNTIME.HOST_VOXELIZE input-pipeline path) must be
    bit-identical to the device voxelize: same ascending-cell-id slots, same
    cap behavior, same point validity."""
    from tmae_tpu.ops.voxelize import voxelize_host

    rng = np.random.RandomState(0)
    B, P = 2, 4000
    pts = rng.uniform(-6, 6, (B, P, 4)).astype(np.float32)  # some out of range
    mask = rng.rand(B, P) < 0.9
    dev = voxelize(jnp.asarray(pts), jnp.asarray(mask), SPEC)
    host = voxelize_host(pts, mask, SPEC)
    for k in ('voxel_coords', 'voxel_mask', 'point_voxel', 'point_valid',
              'num_voxels'):
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k], err_msg=k)


def test_host_voxelize_model_equivalence():
    """A CenterPoint forward fed the host-precomputed pillar map equals the
    on-device voxelize path exactly."""
    import jax

    from tests.tiny_cfg import synth_batch, tiny_cfg
    from tmae_tpu.models.detectors import build_detector, make_voxel_spec

    cfg = tiny_cfg(mae=False)
    model = build_detector(cfg)
    rng = np.random.RandomState(1)
    raw = synth_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out_dev = model.apply(variables, batch, train=False)

    from tmae_tpu.ops.voxelize import voxelize_host
    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    hv_c = voxelize_host(raw['points'], raw['point_mask'], spec)
    hv_p = voxelize_host(raw['points_prev'], raw['point_mask_prev'], spec)
    batch2 = dict(batch)
    for which, hv in (('cur', hv_c), ('prv', hv_p)):
        batch2[f'pv_{which}'] = jnp.asarray(hv['point_voxel'])
        batch2[f'pvalid_{which}'] = jnp.asarray(hv['point_valid'])
        batch2[f'vcoords_{which}'] = jnp.asarray(hv['voxel_coords'])
        batch2[f'vmask_{which}'] = jnp.asarray(hv['voxel_mask'])
    out_host = model.apply(variables, batch2, train=False)
    np.testing.assert_allclose(
        np.asarray(out_dev['pred_dicts'][0]['hm']),
        np.asarray(out_host['pred_dicts'][0]['hm']), atol=1e-6)


def test_host_voxelize_sorted_model_equivalence():
    """The HOST_VOXELIZE_SORT path (points permuted by pillar slot, host-
    computed pillar means + segment ends) matches the on-device voxelize
    path up to the f64-vs-f32 mean accumulation order."""
    import jax

    from tests.tiny_cfg import synth_batch, tiny_cfg
    from tmae_tpu.models.detectors import build_detector, make_voxel_spec
    from tmae_tpu.ops.voxelize import voxelize_host

    cfg = tiny_cfg(mae=False)
    model = build_detector(cfg)
    rng = np.random.RandomState(1)
    raw = synth_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out_dev = model.apply(variables, batch, train=False)

    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    batch2 = dict(batch)
    for which, pk, mk in (('cur', 'points', 'point_mask'),
                          ('prv', 'points_prev', 'point_mask_prev')):
        hv = voxelize_host(raw[pk], raw[mk], spec, sort_points=True)
        # sanity: per-slot mean matches a direct recomputation
        for b in range(raw[pk].shape[0]):
            pv, ok = hv['point_voxel'][b], hv['point_valid'][b]
            for v in range(int(hv['num_voxels'][b])):
                sel = ok & (pv == v)
                np.testing.assert_allclose(
                    hv['voxel_mean_xyz'][b, v],
                    hv['points'][b][sel, :3].mean(axis=0), rtol=1e-5)
                assert int(hv['seg_ends'][b, v]) == int(np.flatnonzero(sel)[-1])
        batch2[pk] = jnp.asarray(hv['points'])
        batch2[mk] = jnp.asarray(hv['point_mask'])
        batch2[f'pv_{which}'] = jnp.asarray(hv['point_voxel'])
        batch2[f'pvalid_{which}'] = jnp.asarray(hv['point_valid'])
        batch2[f'vcoords_{which}'] = jnp.asarray(hv['voxel_coords'])
        batch2[f'vmask_{which}'] = jnp.asarray(hv['voxel_mask'])
        batch2[f'vmean_{which}'] = jnp.asarray(hv['voxel_mean_xyz'])
        batch2[f'vends_{which}'] = jnp.asarray(hv['seg_ends'])
    out_host = model.apply(variables, batch2, train=False)
    np.testing.assert_allclose(
        np.asarray(out_dev['pred_dicts'][0]['hm']),
        np.asarray(out_host['pred_dicts'][0]['hm']), atol=2e-4)
