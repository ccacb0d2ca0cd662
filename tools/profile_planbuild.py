#!/usr/bin/env python
"""Microbenchmark: compaction plan-build strategies on the attached
accelerator (loop-amortized in one jit, data-dependent carry).

Compares occupied-first raster compaction of a [B, NW] boolean mask:
  * argsort    — stable argsort over NW lanes (bitonic on TPU)
  * scatter    — cumsum + scatter of iota to slots (ops/occ_compact.py)
  * searchsort — cumsum + vectorized binary search for the s-th occupied

and the full build_bucketed_compact_info at production caps.
"""

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

    from tmae_tpu.ops import occ_compact as oc

    B, H, W = 1, 468, 468
    rng = np.random.RandomState(0)
    occ0 = jnp.asarray(rng.rand(B, H, W) < 0.10)
    kocc0 = jnp.asarray(rng.rand(B, H, W) < 0.10)

    def timed(name, fn, *args, reps_pair=(8, 40)):
        """Slope between two loop lengths cancels the per-dispatch relay RTT
        (~34 ms), which otherwise floors tiny ops at RTT/LOOPS."""
        times = []
        for reps in reps_pair:
            @jax.jit
            def run(*a):
                def body(c, _):
                    return fn(c, *a), None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=reps)
                return out

            run(*args)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(*args))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
        dt = (times[1] - times[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:28s}{dt:8.3f} ms', flush=True)

    nwy, nwx = 60, 60
    NW = nwy * nwx
    cap = 640

    def mask_from(c, occ):
        m = oc.window_cell_counts(
            occ ^ (c > 1e30), 8, False) > 0
        return m

    def via_argsort(c, occ):
        pool = mask_from(c, occ)
        flat = pool.reshape(B, -1)
        order = jnp.argsort(~flat, axis=1, stable=True).astype(jnp.int32)
        slot = order[:, :cap]
        return jnp.sum(slot.astype(jnp.float32)) * 1e-30 + c * 0.0

    def via_scatter(c, occ):
        pool = mask_from(c, occ)
        idx, valid, n = oc._indices_from_mask(pool, cap)
        return jnp.sum(idx.astype(jnp.float32)) * 1e-30 + c * 0.0

    def via_searchsorted(c, occ):
        pool = mask_from(c, occ)
        flat = pool.reshape(B, -1).astype(jnp.int32)
        csum = jnp.cumsum(flat, axis=1)
        q = jnp.arange(1, cap + 1)

        def one(cs):
            return jnp.searchsorted(cs, q, side='left')

        slot = jax.vmap(one)(csum)
        return jnp.sum(slot.astype(jnp.float32)) * 1e-30 + c * 0.0

    timed('indices: argsort', via_argsort, occ0)
    timed('indices: cumsum+scatter', via_scatter, occ0)
    timed('indices: searchsorted', via_searchsorted, occ0)

    def full_plan(c, occ, kocc):
        occ = occ ^ (c > 1e30)
        bc = oc.build_bucketed_compact_info(
            occ, 8, False, 640, 112, (H, W), kv_occ=None,
            small_tokens=16, mid_cap=128, mid_tokens=48)
        return (jnp.sum(bc.small.idx.astype(jnp.float32))
                + jnp.sum(bc.full.idx.astype(jnp.float32))) * 1e-30 + c * 0.0

    def full_plan_cross(c, occ, kocc):
        occ = occ ^ (c > 1e30)
        bc = oc.build_bucketed_compact_info(
            occ, 8, False, 640, 112, (H, W), kv_occ=kocc,
            small_tokens=16, mid_cap=128, mid_tokens=48)
        return (jnp.sum(bc.small.idx.astype(jnp.float32))
                + jnp.sum(bc.full.idx.astype(jnp.float32))) * 1e-30 + c * 0.0

    timed('bucketed plan (self)', full_plan, occ0, kocc0)
    timed('bucketed plan (cross)', full_plan_cross, occ0, kocc0)


if __name__ == '__main__':
    main()
