"""Cross-check: the dense window-attention path (reshape-based, hot) must agree
with the list path (sort/scatter-based, reference-shaped) on identical weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tmae_tpu.models.sst as sst_mod
from tmae_tpu.models.sst import (
    CosineWindowAttention, DenseWindowAttention, DenseGrid, VoxelSet,
)
from tmae_tpu.ops.windows import window_partition
from tmae_tpu.ops.posembed import window_pos_embed
from tmae_tpu.ops.dense_windows import window_view, window_unview, slot_pos_embed


@pytest.fixture(autouse=True)
def f32_dense(monkeypatch):
    monkeypatch.setattr(sst_mod, 'COMPUTE_DTYPE', jnp.float32)


def make_voxels(n=40, grid=32, seed=0, V=64):
    rng = np.random.RandomState(seed)
    cells = rng.permutation(grid * grid)[:n]
    coords = np.zeros((1, V, 2), np.int32)
    mask = np.zeros((1, V), bool)
    coords[0, :n, 0] = cells // grid
    coords[0, :n, 1] = cells % grid
    mask[0, :n] = True
    feat = rng.randn(1, V, 16).astype(np.float32)
    return jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(feat)


def test_window_view_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 3).astype(np.float32))
    for shift in (False, True):
        w = window_view(x, 8, shift)
        back = window_unview(w, (20, 20), 8, shift)
        assert np.allclose(np.asarray(back), np.asarray(x))


def test_slot_pos_matches_list_pos():
    # positional embedding of a voxel at (y, x): list path computes from
    # (y+off)%w; dense path uses the slot index — they must agree
    coords, mask, feat = make_voxels()
    for shift in (False, True):
        wp = window_partition(coords, mask, (32, 32), window=8, shift=shift)
        pos_list = window_pos_embed(wp.pos_yx, 8, 16)  # [1, V, 16]
        slots = slot_pos_embed(8, 16)  # [64, 16]
        r = np.asarray(wp.inner_rank[0])
        m = np.asarray(mask[0])
        assert np.allclose(
            np.asarray(pos_list[0])[m], np.asarray(slots)[r[m]], atol=1e-5
        )


@pytest.mark.parametrize('shift', [False, True])
def test_dense_attention_matches_list(shift):
    coords, mask, feat = make_voxels()
    grid_hw = (32, 32)
    wp = window_partition(coords, mask, grid_hw, window=8, shift=shift)
    pos = window_pos_embed(wp.pos_yx, 8, 16)

    list_mod = CosineWindowAttention(d_model=16, nhead=4)
    vars_l = list_mod.init(jax.random.PRNGKey(0), feat, pos, wp, feat, pos, wp)
    out_list = list_mod.apply(vars_l, feat, pos, wp, feat, pos, wp)

    vs = VoxelSet(feat=feat, coords=coords, mask=mask, grid_hw=grid_hw)
    g = DenseGrid(x=vs.to_dense(), occ=vs.occupancy())
    dense_mod = DenseWindowAttention(d_model=16, nhead=4, window=8, shift=shift)
    # dense self-attn uses flat params with a fused qk projection
    pl = vars_l['params']
    vars_d = {'params': {
        'qk_kernel': jnp.concatenate(
            [pl['q_proj']['kernel'], pl['k_proj']['kernel']], axis=1),
        'qk_bias': jnp.concatenate(
            [pl['q_proj']['bias'], pl['k_proj']['bias']]),
        'v_kernel': pl['v_proj']['kernel'],
        'v_bias': pl['v_proj']['bias'],
        'out_kernel': pl['out_proj']['kernel'],
        'out_bias': pl['out_proj']['bias'],
        'tau': pl['tau'],
    }}
    out_dense_grid = dense_mod.apply(vars_d, g)

    # compare at voxel positions
    from tmae_tpu.ops.voxelize import gather_from_grid
    out_dense = gather_from_grid(out_dense_grid, coords, mask)
    m = np.asarray(mask[0])
    a = np.asarray(out_list[0])[m]
    b = np.asarray(out_dense[0])[m]
    assert np.allclose(a, b, atol=1e-4), np.abs(a - b).max()


def test_dense_cross_attention_prev_gate():
    # windows with no prev occupancy must produce zero attention output
    coords, mask, feat = make_voxels(n=30)
    coords_p, mask_p, feat_p = make_voxels(n=10, seed=3)
    vs = VoxelSet(feat=feat, coords=coords, mask=mask, grid_hw=(32, 32))
    vp = VoxelSet(feat=feat_p, coords=coords_p, mask=mask_p, grid_hw=(32, 32))
    g = DenseGrid(x=vs.to_dense(), occ=vs.occupancy())
    gp = DenseGrid(x=vp.to_dense(), occ=vp.occupancy())
    mod = DenseWindowAttention(d_model=16, nhead=4, window=8, shift=False)
    vars_d = mod.init(jax.random.PRNGKey(0), g, gp)
    out = np.asarray(mod.apply(vars_d, g, gp))
    # cells whose window has no prev voxel → exactly zero
    occ_p = np.asarray(gp.occ[0])
    win_has_prev = np.zeros((5, 5), bool)
    for y in range(32):
        for x in range(32):
            if occ_p[y, x]:
                win_has_prev[(y + 8) // 8 - 1, (x + 8) // 8 - 1] = True
    occ_c = np.asarray(g.occ[0])
    for y in range(32):
        for x in range(32):
            if occ_c[y, x] and not win_has_prev[(y + 8) // 8 - 1, (x + 8) // 8 - 1]:
                assert np.allclose(out[0, y, x], 0.0)
