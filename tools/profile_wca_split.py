#!/usr/bin/env python
"""Per-stage timing inside SiamWCA with the PRODUCTION compaction caps:
SST blocks (batched two-frame), WCA blocks, pyramid fuse, plan builds —
scan-slope method over real (synthetic-lidar) occupancy."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import make_voxel_spec
    from tmae_tpu.models.siamwca import PyramidFuse
    from tmae_tpu.models.sst import DenseGrid, SSTBlock, VoxelSet
    from tmae_tpu.models.vfe import TemporalDynVFE
    from tmae_tpu.models.wca import WCABlock
    from tmae_tpu.models.layers import CARRIER_DTYPE

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev')}
    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    nx, ny, _ = spec.grid_size
    rt = cfg.RUNTIME
    caps = [int(v) for v in rt['OCC_WINDOW_CAPS']]
    smalls = [int(v) for v in rt.get('OCC_SMALL_CAPS', [0, 0, 0])]
    mids = [int(v) for v in rt.get('OCC_MID_CAPS', [0, 0, 0])]
    blocks_cfg = cfg.MODEL.BACKBONE_3D['SST_BLOCK_LIST']

    times = {}

    def scan_time(name, fn, reps_pair=(16, 48)):
        ts = []
        for reps in reps_pair:
            @jax.jit
            def loop():
                def body(c, _):
                    return fn(c).astype(jnp.float32) * 1e-30, None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=reps)
                return out
            _ = jax.device_get(loop())
            t0 = time.perf_counter()
            _ = jax.device_get(loop())
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:30s}{dt:8.2f} ms', flush=True)
        times[name] = dt
        return dt

    # real occupancy: run the VFE once
    vfe_cfg = cfg.MODEL.VFE
    vfe = TemporalDynVFE(spec, mlps=[list(m) for m in vfe_cfg['MLPS']])
    v_vfe = jax.jit(lambda r: vfe.init(
        r, dev['points'], dev['point_mask'], dev['points_prev'],
        dev['point_mask_prev'], False))(jax.random.PRNGKey(0))
    cur, prv = jax.jit(
        lambda b: vfe.apply(v_vfe, b['points'], b['point_mask'],
                            b['points_prev'], b['point_mask_prev'], False)
    )(dev)
    hw = (ny, nx)
    vs_cur = VoxelSet(cur['voxel_features'], cur['voxel_coords'],
                      cur['voxel_mask'], hw)
    vs_prv = VoxelSet(prv['voxel_features'], prv['voxel_coords'],
                      prv['voxel_mask'], hw)
    g_cur = DenseGrid(x=vs_cur.to_dense().astype(CARRIER_DTYPE),
                      occ=vs_cur.occupancy())
    g_prv = DenseGrid(x=vs_prv.to_dense().astype(CARRIER_DTYPE),
                      occ=vs_prv.occupancy())
    both = DenseGrid(x=jnp.concatenate([g_cur.x, g_prv.x], 0),
                     occ=jnp.concatenate([g_cur.occ, g_prv.occ], 0))
    print('occupied stride1 cells:', int(g_cur.occ.sum()), flush=True)

    # --- per-stage SST blocks on the batched two-frame carrier ---
    hid = [None, None, None]
    g = both
    for i, bc in enumerate(blocks_cfg):
        blk = SSTBlock(encoder_cfg=dict(bc['ENCODER']), window=8,
                       max_tokens=64, occ_window_cap=caps[i],
                       occ_small_cap=smalls[i], occ_mid_cap=mids[i],
                       remat=False, name=f'sst{i}')
        v = jax.jit(lambda r, gg: blk.init(r, gg, False))(
            jax.random.PRNGKey(i), g)
        gi = g

        def f(c, blk=blk, v=v, gi=gi):
            gg = DenseGrid(x=gi.x + c * jnp.asarray(1e-30, gi.x.dtype),
                           occ=gi.occ)
            return jnp.sum(blk.apply(v, gg, False).x.astype(jnp.float32))

        scan_time(f'sst_block_{i} (B=2)', f)
        g = jax.jit(lambda gg: blk.apply(v, gg, False))(g)
        hid[i] = g

    # --- per-stage WCA blocks (cur x prev at each scale) ---
    B = 1
    hcur = [DenseGrid(x=h.x[:B], occ=h.occ[:B]) for h in hid]
    hprv = [DenseGrid(x=h.x[B:], occ=h.occ[B:]) for h in hid]
    fused = []
    for i, bc in enumerate(blocks_cfg):
        wblk = WCABlock(encoder_cfg=dict(bc['ENCODER']), window=8,
                        max_tokens=64, occ_window_cap=caps[i],
                        occ_small_cap=smalls[i], occ_mid_cap=mids[i],
                        name=f'wca{i}')
        v = jax.jit(lambda r, a, b: wblk.init(r, a, b, False))(
            jax.random.PRNGKey(10 + i), hcur[i], hprv[i])

        def f(c, wblk=wblk, v=v, a=hcur[i], b=hprv[i]):
            aa = DenseGrid(x=a.x + c * jnp.asarray(1e-30, a.x.dtype),
                           occ=a.occ)
            return jnp.sum(wblk.apply(v, aa, b, False).x.astype(jnp.float32))

        scan_time(f'wca_block_{i}', f)
        fused.append(jax.jit(lambda a, b, v=v, wblk=wblk:
                             wblk.apply(v, a, b, False))(hcur[i], hprv[i]))

    # --- pyramid fuse ---
    fuse_layers = [dict(cfg.MODEL.BACKBONE_3D['FUSE_LAYER'][s])
                   for s in cfg.MODEL.BACKBONE_3D['FEATURES_SOURCE']]
    fuse = PyramidFuse(fuse_layers, name='fuse')
    v_fuse = jax.jit(lambda r: fuse.init(
        r, [f.x for f in fused], False))(jax.random.PRNGKey(42))

    def f_fuse(c):
        xs = [f.x + c * jnp.asarray(1e-30, f.x.dtype) for f in fused]
        return jnp.sum(fuse.apply(v_fuse, xs, False).astype(jnp.float32))

    scan_time('PyramidFuse', f_fuse)

    # --- plan builds alone (all stages, both shifts, bucketed) ---
    from tmae_tpu.ops.occ_compact import build_bucketed_compact_info

    occs = [both.occ]
    from tmae_tpu.models.sst import occ_downsample
    for _ in range(2):
        occs.append(occ_downsample(occs[-1]))

    def f_plans(c):
        acc = c * 1e-30
        for i, occ in enumerate(occs):
            occ_j = jnp.logical_or(occ, acc > 1e30)
            hw_i = (occ.shape[1], occ.shape[2])
            for s in (False, True):
                bc = build_bucketed_compact_info(
                    occ_j, 8, s, smalls[i], caps[i], hw_i,
                    small_tokens=16, mid_cap=mids[i], mid_tokens=48)
                acc = acc + jnp.sum(bc.cat_idx).astype(jnp.float32)
        return acc

    scan_time('plan builds (6 stages x 2 shifts)', f_plans)

    # --- pad/repad/unpad full-grid passes at stride 1 ---
    from tmae_tpu.ops.occ_compact import pad_grid, repad_grid, unpad_grid

    def f_pads(c):
        xp = pad_grid(both.x + c * jnp.asarray(1e-30, both.x.dtype), 8, False)
        xp = repad_grid(xp, 8, False, True)
        xp = repad_grid(xp, 8, True, False)
        x = unpad_grid(xp, (468, 468), 8, False)
        return jnp.sum(x.astype(jnp.float32))

    scan_time('pad+2repad+unpad @468 (B=2)', f_pads)

    # --- gather+scatter roundtrip at stage-1 caps ---
    from tmae_tpu.ops.occ_compact import (
        gather_windows_padded, scatter_windows_into_padded,
    )
    bc0 = jax.jit(lambda o: build_bucketed_compact_info(
        o, 8, False, smalls[0], caps[0], (468, 468), small_tokens=16,
        mid_cap=mids[0], mid_tokens=48))(both.occ)
    xp0 = jax.jit(lambda x: pad_grid(x, 8, False))(both.x)

    def f_gs(c):
        xp = xp0 + c * jnp.asarray(1e-30, xp0.dtype)
        xw = gather_windows_padded(xp, bc0.cat_idx, 8)
        out = scatter_windows_into_padded(xw, bc0.cat_idx, xp, 8)
        return jnp.sum(out.astype(jnp.float32))

    scan_time('gather+scatter cat_idx stage1', f_gs)

    # --- analytic FLOPs + achieved MFU per stage (VERDICT r4 #2) ---
    from tmae_tpu.utils.flops import format_table, model_flops_breakdown

    bd = model_flops_breakdown(cfg, batch=1)
    tmap = {
        'sst_block_0 (2 frames)': times.get('sst_block_0 (B=2)'),
        'sst_block_1 (2 frames)': times.get('sst_block_1 (B=2)'),
        'sst_block_2 (2 frames)': times.get('sst_block_2 (B=2)'),
        'wca_block_0': times.get('wca_block_0'),
        'wca_block_1': times.get('wca_block_1'),
        'wca_block_2': times.get('wca_block_2'),
        'pyramid_fuse': times.get('PyramidFuse'),
    }
    print('\nFLOPs/MFU (analytic, dispatched bucket shapes; v5e bf16 peak):')
    print(format_table(bd, {k: v for k, v in tmap.items() if v}))


if __name__ == '__main__':
    main()
