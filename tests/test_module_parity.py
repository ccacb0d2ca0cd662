"""Whole-module numeric parity against the reference's pure-torch modules
(loaded from /root/reference via tests/ref_loader.py with CUDA stubs).

These drive the reference's OWN window pipeline — SSTInputLayer /
SSTInputLayer_Temporal building the flat2win dicts, then BasicShiftBlockV2 /
BasicShiftBlock_WCA — against this framework's dense-carrier blocks with
converted weights. This is the strongest AP-parity proxy available without the
released checkpoint (VERDICT round 1, item 3)."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from ref_loader import CfgDict, ref_module

C, FF, NHEAD, WIN = 128, 256, 8, 8
GRID = 24  # 3x3 windows + shift padding


@pytest.fixture(autouse=True)
def f32_compute(monkeypatch):
    """Run our blocks in f32 so the comparison isolates SEMANTICS; the bf16
    compute policy's numerics envelope is covered by the kernel tests."""
    import tmae_tpu.models.layers as layers
    import tmae_tpu.models.sst as sst

    monkeypatch.setattr(sst, 'COMPUTE_DTYPE', jnp.float32)
    monkeypatch.setattr(layers, 'CARRIER_DTYPE', jnp.float32)
    monkeypatch.setattr(layers, 'CONV_DTYPE', jnp.float32)


def _drop_info():
    d = {0: {'max_tokens': 64, 'drop_range': [0, 100000]}}
    return {'train': d, 'test': d}


def _input_layer_cfg():
    return CfgDict(
        WINDOW_SHAPE=[WIN, WIN, 1], SHUFFLE_VOXELS=False,
        DROP_INFO=_drop_info(), POS_TEMPERATURE=1000, NORMALIZE_POS=False,
    )


def _rand_voxels(rng, n, grid=GRID):
    cells = rng.permutation(grid * grid)[:n]
    y, x = cells // grid, cells % grid
    coords = np.stack([np.zeros(n), np.zeros(n), y, x], 1).astype(np.int64)
    feats = rng.randn(n, C).astype(np.float32) * 0.5
    return coords, feats


def _dense_grid(coords, feats, grid=GRID):
    from tmae_tpu.models.sst import DenseGrid

    x = np.zeros((1, grid, grid, C), np.float32)
    occ = np.zeros((1, grid, grid), bool)
    x[0, coords[:, 2], coords[:, 3]] = feats
    occ[0, coords[:, 2], coords[:, 3]] = True
    return DenseGrid(x=jnp.asarray(x), occ=jnp.asarray(occ))


def _encoder_layer_params(el, cross):
    sa = el.win_attn.cross_attn if cross else el.win_attn.self_attn
    w = sa.in_proj_weight.detach().numpy()
    b = sa.in_proj_bias.detach().numpy()
    wq, wk, wv = w[:C].T, w[C:2 * C].T, w[2 * C:].T
    bq, bk, bv = b[:C], b[C:2 * C], b[2 * C:]
    p = {
        'v_kernel': wv, 'v_bias': bv,
        'out_kernel': sa.out_proj.weight.detach().numpy().T,
        'out_bias': sa.out_proj.bias.detach().numpy(),
        'tau': sa.tau.detach().numpy().reshape(-1)[:1],
        'ln1_scale': el.norm1.weight.detach().numpy(),
        'ln1_bias': el.norm1.bias.detach().numpy(),
        'ffn1_kernel': el.linear1.weight.detach().numpy().T,
        'ffn1_bias': el.linear1.bias.detach().numpy(),
        'ffn2_kernel': el.linear2.weight.detach().numpy().T,
        'ffn2_bias': el.linear2.bias.detach().numpy(),
        'ln2_scale': el.norm2.weight.detach().numpy(),
        'ln2_bias': el.norm2.bias.detach().numpy(),
    }
    if cross:
        p.update(q_kernel=wq, q_bias=bq, k_kernel=wk, k_bias=bk)
    else:
        p['qk_kernel'] = np.concatenate([wq, wk], 1)
        p['qk_bias'] = np.concatenate([bq, bk])
    return {k: jnp.asarray(v) for k, v in p.items()}


def _block_params(tblock, cross):
    return {'params': {
        f'EncoderLayer_{i}': _encoder_layer_params(tblock.encoder_list[i],
                                                   cross)
        for i in range(2)
    }}


def test_basic_shift_block_v2_parity():
    """Reference BasicShiftBlockV2 through SSTInputLayer's own flat2win
    pipeline == our DenseShiftBlock on the dense carrier, same weights
    (sst_basic_block.py:87-114, spt_backbone.py:11-243)."""
    spt = ref_module('pcdet.models.backbones_3d.spt_backbone')
    sbb = ref_module('pcdet.models.model_utils.sst_basic_block')
    from tmae_tpu.models.sst import DenseShiftBlock

    rng = np.random.RandomState(0)
    coords, feats = _rand_voxels(rng, 120)

    torch.manual_seed(0)
    input_layer = spt.SSTInputLayer(model_cfg=_input_layer_cfg())
    input_layer.eval()
    tblock = sbb.BasicShiftBlockV2(
        C, NHEAD, FF, dropout=0.0, activation='gelu',
        layer_cfg={'cosine': True, 'tau_min': 0.01},
    )
    tblock.eval()
    with torch.no_grad():
        info = input_layer({
            'voxel_features': torch.from_numpy(feats),
            'voxel_coords': torch.from_numpy(coords),
            'voxel_shuffle_inds': torch.arange(len(feats)),
            'grid_size': np.array([GRID, GRID, 1]),
        })
        out_ref = tblock(
            info['voxel_features'],
            [info['pos_dict_shift0'], info['pos_dict_shift1']],
            [info['flat2win_inds_shift0'], info['flat2win_inds_shift1']],
            [info['key_mask_shift0'], info['key_mask_shift1']],
        ).numpy()
    ref_coords = info['voxel_coords'].numpy()

    ours = DenseShiftBlock(C, NHEAD, FF, WIN)
    grid = _dense_grid(coords, feats)
    out = ours.apply(_block_params(tblock, cross=False), grid)
    got = np.asarray(out.x[0])[ref_coords[:, 2], ref_coords[:, 3]]
    err = np.abs(got - out_ref).max()
    assert err < 2e-3, err


def test_basic_shift_block_wca_parity():
    """Reference BasicShiftBlock_WCA through SSTInputLayer_Temporal's coupled
    two-frame pipeline == our cross DenseShiftBlock (wca_block.py:106-145,
    SiamWCA.py:21-269)."""
    siam = ref_module('pcdet.models.backbones_3d.SiamWCA')
    wca = ref_module('pcdet.models.model_utils.wca_block')
    from tmae_tpu.models.sst import DenseShiftBlock

    rng = np.random.RandomState(1)
    coords, feats = _rand_voxels(rng, 100)
    coords_prv, feats_prv = _rand_voxels(rng, 90)

    torch.manual_seed(1)
    input_layer = siam.SSTInputLayer_Temporal(model_cfg=_input_layer_cfg())
    input_layer.eval()
    tblock = wca.BasicShiftBlock_WCA(
        C, NHEAD, FF, dropout=0.0, activation='gelu',
        layer_cfg={'cosine': True, 'tau_min': 0.01},
    )
    tblock.eval()
    with torch.no_grad():
        info, info_prv = input_layer([
            {
                'voxel_features': torch.from_numpy(feats),
                'voxel_coords': torch.from_numpy(coords),
                'voxel_shuffle_inds': torch.arange(len(feats)),
                'grid_size': np.array([GRID, GRID, 1]),
            },
            {
                'voxel_features': torch.from_numpy(feats_prv),
                'voxel_coords': torch.from_numpy(coords_prv),
                'voxel_shuffle_inds': torch.arange(len(feats_prv)),
                'grid_size': np.array([GRID, GRID, 1]),
            },
        ])
        out_ref = tblock(
            info['voxel_features'],
            [info['pos_dict_shift0'], info['pos_dict_shift1']],
            [info['flat2win_inds_shift0'], info['flat2win_inds_shift1']],
            [info['voxel_keep_inds_shift0'], info['voxel_keep_inds_shift1']],
            [info_prv['key_mask_shift0'], info_prv['key_mask_shift1']],
            info_prv['voxel_features'],
            [info_prv['pos_dict_shift0'], info_prv['pos_dict_shift1']],
            [info_prv['flat2win_inds_shift0'],
             info_prv['flat2win_inds_shift1']],
            [info_prv['voxel_keep_inds_shift0'],
             info_prv['voxel_keep_inds_shift1']],
        ).numpy()
    ref_coords = info['voxel_coords'].numpy()

    ours = DenseShiftBlock(C, NHEAD, FF, WIN, cross=True)
    grid = _dense_grid(coords, feats)
    grid_prv = _dense_grid(coords_prv, feats_prv)
    out = ours.apply(_block_params(tblock, cross=True), grid, grid_prv)
    got = np.asarray(out.x[0])[ref_coords[:, 2], ref_coords[:, 3]]
    err = np.abs(got - out_ref).max()
    assert err < 2e-3, err
