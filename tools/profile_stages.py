#!/usr/bin/env python
"""Stage-level timing of the full-size T-MAE finetune forward on the attached
accelerator.

Timing method: each stage runs inside ONE jitted ``lax.scan`` (16 vs 48
iterations; per-iteration time = slope between the two), with a loop-carried
perturbation of one input leaf so XLA cannot hoist the body. This cancels the
relay round-trip and dispatch overheads that drown per-stage costs when timing
individual calls (the axon RTT is ~25 ms; stages are 1-20 ms)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax

    cache_dir = REPO / '.jax_cache'
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import (
        build_detector, centerpoint_predict, make_voxel_spec,
    )
    from tmae_tpu.models.vfe import TemporalDynVFE
    from tmae_tpu.models.siamwca import SiamWCA
    from tmae_tpu.models.bev import SSTBEVBackbone
    from tmae_tpu.models.center_head import CenterHead
    from tmae_tpu.models.sst import VoxelSet

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev',
                    # serving path: host-voxelize (+ sorted) extras
                    'pv_cur', 'pvalid_cur', 'vcoords_cur', 'vmask_cur',
                    'pv_prv', 'pvalid_prv', 'vcoords_prv', 'vmask_prv',
                    'vmean_cur', 'vends_cur', 'vmean_prv', 'vends_prv')}

    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    nx, ny, _ = spec.grid_size
    mcfg = cfg.MODEL
    caps = tuple(int(v) for v in cfg.RUNTIME.get('OCC_WINDOW_CAPS', ()))

    def scan_time(name, stage_scalar_fn, reps_pair=(16, 48)):
        """stage_scalar_fn(c: f32 scalar) -> f32 scalar; must consume c."""
        times = []
        for reps in reps_pair:
            @jax.jit
            def loop():
                def body(c, _):
                    return stage_scalar_fn(c).astype(jnp.float32) * 1e-30, None
                out, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=reps)
                return out
            _ = jax.device_get(loop())
            t0 = time.perf_counter()
            _ = jax.device_get(loop())
            times.append(time.perf_counter() - t0)
        dt = (times[1] - times[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:14s}{dt:8.2f} ms', flush=True)
        return dt

    # full model
    model = build_detector(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), dev)

    def f_full(c):
        b = dict(dev, points=dev['points'] + c * 1e-30)
        out = model.apply(variables, b, train=False)
        return sum(jnp.sum(p['hm'].astype(jnp.float32))
                   for p in out['pred_dicts'])

    t_full = scan_time('full forward', f_full, reps_pair=(8, 24))

    def f_full_decode(c):
        b = dict(dev, points=dev['points'] + c * 1e-30)
        out = model.apply(variables, b, train=False)
        boxes, scores, labels, valid = centerpoint_predict(
            cfg, out, nms_on_device=False)
        return jnp.sum(scores)

    t_fd = scan_time('full + decode', f_full_decode, reps_pair=(8, 24))
    print(f'   (decode ~{t_fd - t_full:.2f} ms)', flush=True)

    # stage: VFE
    vfe_cfg = mcfg.VFE
    vfe = TemporalDynVFE(
        spec, mlps=[list(m) for m in vfe_cfg['MLPS']],
        use_absolute_xyz=vfe_cfg.get('USE_ABSLOTE_XYZ', True),
        use_cluster_xyz=vfe_cfg.get('USE_CLUSTER_XYZ', True),
        with_distance=vfe_cfg.get('WITH_DISTANCE', False),
    )
    v_vfe = jax.jit(lambda r: vfe.init(
        r, dev['points'], dev['point_mask'], dev['points_prev'],
        dev['point_mask_prev'], False))(jax.random.PRNGKey(0))

    def f_vfe(c):
        cur, prv = vfe.apply(v_vfe, dev['points'] + c * 1e-30,
                             dev['point_mask'], dev['points_prev'],
                             dev['point_mask_prev'], False)
        return (jnp.sum(cur['voxel_features'])
                + jnp.sum(prv['voxel_features']))

    scan_time('VFE (2 frames)', f_vfe)

    if 'vends_cur' in dev:  # serving fast path (host means + sorted max)
        def hv(which):
            return {
                'point_voxel': dev[f'pv_{which}'],
                'point_valid': dev[f'pvalid_{which}'],
                'voxel_coords': dev[f'vcoords_{which}'],
                'voxel_mask': dev[f'vmask_{which}'],
                'voxel_mean_xyz': dev[f'vmean_{which}'],
                'seg_ends': dev[f'vends_{which}'],
            }

        def f_vfe_hv(c):
            cur, prv = vfe.apply(v_vfe, dev['points'] + c * 1e-30,
                                 dev['point_mask'], dev['points_prev'],
                                 dev['point_mask_prev'], False,
                                 hostvox_cur=hv('cur'), hostvox_prv=hv('prv'))
            return (jnp.sum(cur['voxel_features'])
                    + jnp.sum(prv['voxel_features']))

        scan_time('VFE (hostvox)', f_vfe_hv)

    cur, prv = jax.jit(
        lambda b: vfe.apply(v_vfe, b['points'], b['point_mask'],
                            b['points_prev'], b['point_mask_prev'], False)
    )(dev)
    hw = (ny, nx)
    vs_cur = VoxelSet(cur['voxel_features'], cur['voxel_coords'],
                      cur['voxel_mask'], hw)
    vs_prv = VoxelSet(prv['voxel_features'], prv['voxel_coords'],
                      prv['voxel_mask'], hw)

    # stage: SiamWCA backbone (with the production compaction caps)
    bb = SiamWCA(mcfg.BACKBONE_3D,
                 tuple(int(v) for v in cfg.RUNTIME['MAX_VOXELS']),
                 occ_window_caps=caps,
                 occ_small_caps=tuple(
                     int(v) for v in cfg.RUNTIME.get('OCC_SMALL_CAPS', ())),
                 occ_small_tokens=int(
                     cfg.RUNTIME.get('OCC_SMALL_TOKENS', 16)))
    v_bb = jax.jit(lambda r: bb.init(r, vs_cur, vs_prv, False))(
        jax.random.PRNGKey(0))

    def f_bb(c):
        vc = VoxelSet(vs_cur.feat + c * 1e-30, vs_cur.coords, vs_cur.mask, hw)
        spatial, _ = bb.apply(v_bb, vc, vs_prv, False)
        return jnp.sum(spatial)

    scan_time('SiamWCA', f_bb, reps_pair=(8, 24))

    spatial, _ = jax.jit(lambda c, p: bb.apply(v_bb, c, p, False))(
        vs_cur, vs_prv)

    # stage: BEV backbone
    bev = SSTBEVBackbone(mcfg.BACKBONE_2D)
    v_bev = jax.jit(lambda r: bev.init(r, spatial, False))(
        jax.random.PRNGKey(0))

    def f_bev(c):
        return jnp.sum(bev.apply(v_bev, spatial + c * 1e-30, False))

    scan_time('BEV backbone', f_bev)

    spatial2d = jax.jit(lambda s: bev.apply(v_bev, s, False))(spatial)

    # stage: CenterHead
    head = CenterHead(mcfg.DENSE_HEAD, len(cfg.CLASS_NAMES),
                      tuple(cfg.CLASS_NAMES), spec.voxel_size, spec.pc_range)
    v_head = jax.jit(lambda r: head.init(r, spatial2d, False))(
        jax.random.PRNGKey(0))

    def f_head(c):
        preds = head.apply(v_head, spatial2d + c * 1e-30, False)
        return sum(jnp.sum(p['hm'].astype(jnp.float32)) for p in preds)

    scan_time('CenterHead', f_head)


if __name__ == '__main__':
    main()
