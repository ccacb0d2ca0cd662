#!/usr/bin/env python
"""Device rotated-NMS timing at various real-candidate counts (the blocked
early-exit formulation scales with n_valid, not the static K)."""

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

    from tmae_tpu.ops import geometry as geo

    rng = np.random.RandomState(0)
    K = 512

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
        print(f'{name:28s}{dt:8.3f} ms', flush=True)
        return dt

    boxes = np.zeros((K, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-70, 70, (K, 2))
    boxes[:, 2] = rng.uniform(-1, 1, K)
    boxes[:, 3:6] = rng.uniform(1, 5, (K, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, K)
    scores = np.sort(rng.rand(K).astype(np.float32))[::-1].copy()
    jb = jnp.asarray(boxes)
    js = jnp.asarray(scores)

    for n in (64, 128, 256, 512):
        v = jnp.asarray(np.arange(K) < n)

        def f(c, v=v):
            keep = geo.nms_bev_mask(jb + c * 1e-30, js, v, 0.5, 500)
            return jnp.sum(keep.astype(jnp.float32))

        scan_time(f'nms_bev_mask n_valid={n}', f)


if __name__ == '__main__':
    main()
