#!/usr/bin/env python
"""Deconv execution A/B at pyramid-fuse shapes: flax ConvTranspose vs the
matmul + depth-to-space form in layers.DeconvBNReLU (f32 and bf16-relayout
variants), plus the full PyramidFuse."""

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
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def scan_time(name, fn, x, reps_pair=(16, 48)):
        ts = []
        for reps in reps_pair:
            @jax.jit
            def loop():
                def body(c, _):
                    return jnp.sum(
                        fn(x + (c * 1e-30).astype(x.dtype)).astype(
                            jnp.float32)) * 1e-30, None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=reps)
                return out
            _ = jax.device_get(loop())
            t0 = time.perf_counter()
            _ = jax.device_get(loop())
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:44s}{dt:8.3f} ms', flush=True)

    for (Hs, cin, s) in [(234, 256, 2), (117, 256, 4)]:
        x = jnp.asarray(rng.randn(1, Hs, Hs, cin), bf)
        K = jnp.asarray(rng.randn(s, s, cin, 128).astype(np.float32) * 0.05)

        def convt(xx, K=K, s=s):
            return jax.lax.conv_transpose(
                xx, K.astype(bf), (s, s), 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        def matmul_d2s(xx, K=K, s=s, cin=cin):
            B, H, W, _ = xx.shape
            kmat = jnp.transpose(K[::-1, ::-1], (2, 0, 1, 3)).reshape(
                cin, s * s * 128)
            y = jnp.dot(xx, kmat.astype(bf),
                        preferred_element_type=jnp.float32)
            y = y.astype(bf).reshape(B, H, W, s, s, 128)
            return y.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H * s, W * s, 128)

        scan_time(f'conv_transpose {Hs}x{Hs} s={s}', convt, x)
        scan_time(f'matmul+d2s(bf16) {Hs}x{Hs} s={s}', matmul_d2s, x)


if __name__ == '__main__':
    main()
