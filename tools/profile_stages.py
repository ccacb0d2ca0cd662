#!/usr/bin/env python
"""Stage-level timing of the full-size T-MAE finetune forward on the attached
accelerator. Each stage is jitted separately, fed the previous stage's real
device outputs, and returns a single scalar so the axon relay ships no bulk
results (each call then costs compute + one RTT; an empty jit call measures
the RTT to subtract)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def timed(fn, *args, reps=10):
    vals = []
    fn(*args)  # warmup/compile
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        vals.append(time.perf_counter() - t0)
    vals.sort()
    return vals[len(vals) // 2]


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
           if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev')}

    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    nx, ny, _ = spec.grid_size
    mcfg = cfg.MODEL

    # RTT baseline
    rtt = timed(jax.jit(lambda: jnp.float32(0.0)))
    print(f'rtt           {rtt * 1e3:8.2f} ms', flush=True)

    # full model
    model = build_detector(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), dev)

    @jax.jit
    def f_full(b):
        out = model.apply(variables, b, train=False)
        return sum(jnp.sum(p['hm']) for p in out['pred_dicts'])

    t_full = timed(f_full, dev)
    print(f'full forward  {t_full * 1e3:8.2f} ms', flush=True)

    @jax.jit
    def f_full_decode(b):
        out = model.apply(variables, b, train=False)
        boxes, scores, labels, valid = centerpoint_predict(
            cfg, out, nms_on_device=False)
        return jnp.sum(scores)

    t_fd = timed(f_full_decode, dev)
    print(f'full + decode {t_fd * 1e3:8.2f} ms (decode ~{(t_fd - t_full) * 1e3:.2f})', flush=True)

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

    @jax.jit
    def f_vfe(b):
        cur, prv = vfe.apply(v_vfe, b['points'], b['point_mask'],
                             b['points_prev'], b['point_mask_prev'], False)
        return jnp.sum(cur['voxel_features']) + jnp.sum(prv['voxel_features'])

    t_vfe = timed(f_vfe, dev)
    print(f'VFE (2 frames){t_vfe * 1e3:8.2f} ms', flush=True)

    # materialize VFE outputs for the backbone stage
    cur, prv = jax.jit(
        lambda b: vfe.apply(v_vfe, b['points'], b['point_mask'],
                            b['points_prev'], b['point_mask_prev'], False)
    )(dev)
    hw = (ny, nx)
    vs_cur = VoxelSet(cur['voxel_features'], cur['voxel_coords'],
                      cur['voxel_mask'], hw)
    vs_prv = VoxelSet(prv['voxel_features'], prv['voxel_coords'],
                      prv['voxel_mask'], hw)

    # stage: SiamWCA backbone
    bb = SiamWCA(mcfg.BACKBONE_3D,
                 tuple(int(v) for v in cfg.RUNTIME['MAX_VOXELS']))
    v_bb = jax.jit(lambda r: bb.init(r, vs_cur, vs_prv, False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def f_bb(c, p):
        spatial, _ = bb.apply(v_bb, c, p, False)
        return jnp.sum(spatial)

    t_bb = timed(f_bb, vs_cur, vs_prv)
    print(f'SiamWCA       {t_bb * 1e3:8.2f} ms', flush=True)

    spatial, _ = jax.jit(lambda c, p: bb.apply(v_bb, c, p, False))(
        vs_cur, vs_prv)

    # stage: BEV backbone
    bev = SSTBEVBackbone(mcfg.BACKBONE_2D)
    v_bev = jax.jit(lambda r: bev.init(r, spatial, False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def f_bev(s):
        return jnp.sum(bev.apply(v_bev, s, False))

    t_bev = timed(f_bev, spatial)
    print(f'BEV backbone  {t_bev * 1e3:8.2f} ms', flush=True)

    spatial2d = jax.jit(lambda s: bev.apply(v_bev, s, False))(spatial)

    # stage: CenterHead
    head = CenterHead(mcfg.DENSE_HEAD, len(cfg.CLASS_NAMES),
                      tuple(cfg.CLASS_NAMES), spec.voxel_size, spec.pc_range)
    v_head = jax.jit(lambda r: head.init(r, spatial2d, False))(
        jax.random.PRNGKey(0))

    @jax.jit
    def f_head(s):
        preds = head.apply(v_head, s, False)
        return sum(jnp.sum(p['hm']) for p in preds)

    t_head = timed(f_head, spatial2d)
    print(f'CenterHead    {t_head * 1e3:8.2f} ms', flush=True)

    parts = t_vfe + t_bb + t_bev + t_head - 4 * rtt
    print(f'--- parts sum {parts * 1e3:8.2f} ms  vs full {(t_full - rtt) * 1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
