#!/usr/bin/env python
"""Loop-amortized block timing: each target runs 8x inside one jit via
lax.scan with a scalar data dependence, so the per-call relay RTT (~32 ms,
±5 ms jitter) is paid once and the per-iteration cost is clean."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

LOOPS = 8


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.models.sst import DenseGrid, SSTBlock
    from tmae_tpu.models.wca import WCABlock
    from tmae_tpu.models.siamwca import PyramidFuse

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    blocks = cfg.MODEL.BACKBONE_3D['SST_BLOCK_LIST']
    rng = np.random.RandomState(0)

    def timed_loop(make_out, *args, reps=5):
        """make_out(carry, *args) -> scalar; scanned LOOPS times."""

        @jax.jit
        def run(*a):
            def body(carry, _):
                return make_out(carry, *a), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=LOOPS)
            return out

        run(*args)
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            vals.append(time.perf_counter() - t0)
        vals.sort()
        return vals[len(vals) // 2] / LOOPS

    def grid(B, HW, C, occ_p=0.15):
        x = jnp.asarray(rng.randn(B, HW, HW, C).astype(np.float32))
        occ = jnp.asarray(rng.rand(B, HW, HW) < occ_p)
        return DenseGrid(x=jnp.where(occ[..., None], x, 0.0), occ=occ)

    # scale-1 SST block (stride 1, C=128) on the batched two-frame carrier
    g1 = grid(2, 468, 128)
    blk1 = SSTBlock(blocks[0]['ENCODER'], remat=False, name='b1')
    v1 = jax.jit(lambda g: blk1.init(jax.random.PRNGKey(0), g, False))(g1)

    t = timed_loop(
        lambda c, g: jnp.sum(
            blk1.apply(v1, DenseGrid(x=g.x + c * 0, occ=g.occ), False).x
        ) * 1e-9, g1)
    print(f'SSTBlock scale1 (2x468^2, C128): {t*1e3:7.2f} ms', flush=True)

    # scale-2 SST block (stride 2 from 468^2 -> 234^2, C=256)
    blk2 = SSTBlock(blocks[1]['ENCODER'], remat=False, name='b2')
    v2 = jax.jit(lambda g: blk2.init(jax.random.PRNGKey(0), g, False))(g1)
    t = timed_loop(
        lambda c, g: jnp.sum(
            blk2.apply(v2, DenseGrid(x=g.x + c * 0, occ=g.occ), False).x
        ) * 1e-9, g1)
    print(f'SSTBlock scale2 (down to 234^2, C256): {t*1e3:7.2f} ms', flush=True)

    # scale-3 from a 234^2 C-256 carrier
    g2 = grid(2, 234, 256)
    blk3 = SSTBlock(blocks[2]['ENCODER'], remat=False, name='b3')
    v3 = jax.jit(lambda g: blk3.init(jax.random.PRNGKey(0), g, False))(g2)
    t = timed_loop(
        lambda c, g: jnp.sum(
            blk3.apply(v3, DenseGrid(x=g.x + c * 0, occ=g.occ), False).x
        ) * 1e-9, g2)
    print(f'SSTBlock scale3 (down to 117^2, C256): {t*1e3:7.2f} ms', flush=True)

    # WCA blocks at each scale (cross attention cur<-prv)
    for tag, hw, ch, wcfg in (('scale1', 468, 128, blocks[0]),
                              ('scale2', 234, 256, blocks[1]),
                              ('scale3', 117, 256, blocks[2])):
        ecfg = dict(wcfg['ENCODER'])
        ecfg['STRIDE'] = 1
        ga = grid(1, hw, ch)
        gb = grid(1, hw, ch)
        wca = WCABlock(ecfg, name=f'wca_{tag}')
        vw = jax.jit(lambda a, b: wca.init(jax.random.PRNGKey(0), a, b,
                                           False))(ga, gb)
        t = timed_loop(
            lambda c, a, b: jnp.sum(
                wca.apply(vw, DenseGrid(x=a.x + c * 0, occ=a.occ), b,
                          False).x) * 1e-9, ga, gb)
        print(f'WCABlock {tag} ({hw}^2, C{ch}): {t*1e3:7.2f} ms', flush=True)

    # pyramid fuse (deblocks)
    fl = cfg.MODEL.BACKBONE_3D['FUSE_LAYER']
    fuse_cfg = [dict(fl[k]) for k in ('x_conv1', 'x_conv2', 'x_conv3')]
    pf = PyramidFuse(fuse_cfg, name='fuse')
    feats = [grid(1, 468, 128).x, grid(1, 234, 256).x, grid(1, 117, 256).x]
    vf = jax.jit(lambda f: pf.init(jax.random.PRNGKey(0), f, False))(feats)
    t = timed_loop(
        lambda c, f: jnp.sum(pf.apply(
            vf, [f[0] + c * 0, f[1], f[2]], False)) * 1e-9, feats)
    print(f'PyramidFuse: {t*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
