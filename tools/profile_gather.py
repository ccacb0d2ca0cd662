#!/usr/bin/env python
"""Microbenchmark: Pallas window gather/scatter against the padded dense grid
(ops/occ_compact.py) — the per-window grid steps are the suspected latency
floor of the compact encoder path. Loop-amortized inside one jit.
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

    B, H, W, C = 1, 468, 468, 128
    w = 8
    rng = np.random.RandomState(0)
    occ = jnp.asarray(rng.rand(B, H, W) < 0.10)

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
            best = min(
                (lambda t0=time.perf_counter(): (float(run(*args)),
                 time.perf_counter() - t0)[1])()
                for _ in range(3)
            )
            times.append(best)
        dt = (times[1] - times[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:34s}{dt:8.3f} ms', flush=True)

    for cap in (256, 880):
        idx, valid, _ = oc.occupied_window_indices(occ, w, False, cap)
        xp0 = oc.pad_grid(
            jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)
                        ).astype(jnp.bfloat16), w, False)

        def g(c, xp, idx):
            xw = oc.gather_windows_padded(xp + c * jnp.bfloat16(1e-30), idx, w)
            return jnp.sum(xw.astype(jnp.float32)) * 1e-30

        def s(c, xp, idx):
            T = w * w
            xw = jnp.full((B, cap, T, C), c * 1e-30, jnp.bfloat16)
            out = oc.scatter_windows_into_padded(xw, idx, xp, w)
            return jnp.sum(out[0, :8, :8].astype(jnp.float32)) * 1e-30

        def gs(c, xp, idx):
            xw = oc.gather_windows_padded(xp + c * jnp.bfloat16(1e-30), idx, w)
            out = oc.scatter_windows_into_padded(xw, idx, xp, w)
            return jnp.sum(out[0, :8, :8].astype(jnp.float32)) * 1e-30

        timed(f'gather cap={cap}', g, xp0, idx)
        timed(f'scatter cap={cap}', s, xp0, idx)
        timed(f'gather+scatter cap={cap}', gs, xp0, idx)


if __name__ == '__main__':
    main()
