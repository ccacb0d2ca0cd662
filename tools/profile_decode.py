#!/usr/bin/env python
"""Top-K decode variants at the ONCE grid (H*W*C = 468*468*5 ≈ 1.1M logits,
K=500): full-sort exact, blocked exact (ops/centernet.exact_topk_flat) at
several (block, m), and approx_max_k at several recall targets."""

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

    from tmae_tpu.ops.centernet import exact_topk_flat

    rng = np.random.RandomState(0)
    B, N, K = 1, 468 * 468 * 5, 500
    # heatmap-like statistics: sigmoid-bias baseline + a few hundred peaks
    flat = np.full((B, N), -6.0, np.float32) + rng.randn(B, N) * 0.6
    peaks = rng.choice(N, 400, replace=False)
    flat[:, peaks] += rng.rand(400) * 10.0
    fj = jnp.asarray(flat)

    def scan_time(name, fn, reps_pair=(32, 96)):
        ts = []
        for reps in reps_pair:
            @jax.jit
            def loop():
                def body(c, _):
                    v, i = fn(fj + c * 1e-30)
                    return jnp.sum(v) * 1e-30, None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=reps)
                return out
            _ = jax.device_get(loop())
            t0 = time.perf_counter()
            _ = jax.device_get(loop())
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:40s}{dt:8.3f} ms', flush=True)

    scan_time('lax.top_k (full sort)', lambda f: jax.lax.top_k(f, K))
    for block, m in [(512, 128), (1024, 64), (1024, 128), (2048, 64),
                     (4096, 32)]:
        scan_time(f'exact_topk_flat block={block} m={m}',
                  lambda f, b=block, mm=m: exact_topk_flat(f, K, b, mm))
    for rt in (0.99, 0.9999):
        scan_time(f'approx_max_k recall={rt}',
                  lambda f, r=rt: jax.lax.approx_max_k(f, K, recall_target=r))


if __name__ == '__main__':
    main()
