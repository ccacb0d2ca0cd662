#!/usr/bin/env python
"""Sub-op timing of the dynamic VFE at production density (131072-point pad):
voxelize, segment mean, feature build, MLP stack, segment max — scan-slope
method (see tools/profile_stages.py docstring)."""

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
    from tmae_tpu.models.vfe import DynPillarEncoder
    from tmae_tpu.ops.voxelize import (
        segment_max, segment_mean, voxelize,
    )

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ('points', 'point_mask')}
    spec = make_voxel_spec(cfg.DATA_CONFIG, cfg.RUNTIME)
    V = spec.max_voxels
    pts, mask = dev['points'], dev['point_mask']
    print(f'P={pts.shape[1]} V={V} grid={spec.grid_size}', flush=True)

    def scan_time(name, fn, reps_pair=(16, 48)):
        times = []
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
            times.append(time.perf_counter() - t0)
        dt = (times[1] - times[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:22s}{dt:8.2f} ms', flush=True)
        return dt

    def f_vox(c):
        vox = voxelize(pts + c * 1e-30, mask, spec)
        return jnp.sum(vox['point_voxel'])

    scan_time('voxelize', f_vox)

    vox = jax.jit(lambda: voxelize(pts, mask, spec))()

    def f_mean(c):
        m = segment_mean(pts + c * 1e-30, vox['point_voxel'], V,
                         valid=vox['point_valid'])
        return jnp.sum(m)

    scan_time('segment_mean(4ch)', f_mean)

    def f_segmax(c):
        x = jnp.broadcast_to((pts[..., :1] + c * 1e-30), pts.shape[:2] + (128,))
        m = segment_max(jnp.where(vox['point_valid'][..., None], x, -jnp.inf),
                        vox['point_voxel'], V)
        return jnp.sum(m)

    scan_time('segment_max(128ch)', f_segmax)

    def f_gather(c):
        safe = jnp.minimum(vox['point_voxel'], V - 1)
        g = jnp.take_along_axis(
            jnp.broadcast_to(vox['voxel_coords'][..., :1].astype(jnp.float32)
                             + c * 1e-30,
                             (pts.shape[0], V, 128)),
            safe[..., None].astype(jnp.int32), axis=1)
        return jnp.sum(g)

    scan_time('gather_back(128ch)', f_gather)

    enc = DynPillarEncoder(spec, mlps=[[64, 128]])
    venc = jax.jit(lambda r: enc.init(r, pts, mask, False))(
        jax.random.PRNGKey(0))

    def f_enc(c):
        out = enc.apply(venc, pts + c * 1e-30, mask, False)
        return jnp.sum(out['voxel_features'])

    scan_time('full encoder (1 frame)', f_enc)


if __name__ == '__main__':
    main()
