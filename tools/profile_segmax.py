#!/usr/bin/env python
"""Measure scatter segment_max vs the Pallas sorted-scan kernel at production
VFE shapes (P=131072, V=32769, C=128), plus the full single-frame VFE with and
without the sorted host-voxelize extras. Scan-slope timing (see
tools/profile_stages.py docstring)."""

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
    import numpy as np

    from tmae_tpu.ops.sorted_segments import sorted_segment_max
    from tmae_tpu.ops.voxelize import VoxelSpec, segment_max, voxelize_host

    P, V, C = 131072, 32769, 128
    spec = VoxelSpec(pc_range=(-74.88, -74.88, -5.0, 74.88, 74.88, 3.0),
                     voxel_size=(0.32, 0.32, 8.0), max_points=P, max_voxels=V)
    rng = np.random.RandomState(0)
    pts = np.zeros((1, P, 4), np.float32)
    n_real = 100_000
    pts[0, :n_real, :2] = rng.uniform(-74, 74, (n_real, 2))
    pts[0, :n_real, 2] = rng.uniform(-3, 1, n_real)
    mask = np.zeros((1, P), bool)
    mask[0, :n_real] = True
    hv = voxelize_host(pts, mask, spec, sort_points=True)
    print(f'occupied pillars: {int(hv["num_voxels"][0])}', flush=True)

    feat = jnp.asarray(rng.randn(1, P, C).astype(np.float32))
    seg = jnp.asarray(hv['point_voxel'])
    ends = jnp.asarray(hv['seg_ends'])
    vmask = jnp.asarray(hv['voxel_mask'])
    pvalid = jnp.asarray(hv['point_valid'])

    def slope(f, args, n1=8, n2=40, reps=7):
        def run(n):
            @jax.jit
            def g(*a):
                def body(c, _):
                    out = f(*c[:len(args)])
                    # perturb to defeat hoisting
                    return (c[0] + out.mean() * 1e-12,) + c[1:], None
                c, _ = jax.lax.scan(body, a, None, length=n)
                return c[0].sum()
            g(*args)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(*args))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]
        return (run(n2) - run(n1)) / (n2 - n1)

    t_scatter = slope(
        lambda f: segment_max(jnp.where(pvalid[..., None], f, -jnp.inf),
                              seg, V), (feat,))
    print(f'scatter segment_max      {t_scatter*1e3:7.2f} ms', flush=True)

    t_sorted = slope(
        lambda f: sorted_segment_max(f, seg, ends, vmask, V), (feat,))
    print(f'sorted-scan segment_max  {t_sorted*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
