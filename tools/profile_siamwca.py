#!/usr/bin/env python
"""Break SiamWCA's device time into its constituent ops at real shapes
(468x468 grid, C=128, two frames batched). Scalar-fetch timing protocol."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def timed(fn, *args, reps=8):
    import jax.numpy as jnp
    fn(*args)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        vals.append(time.perf_counter() - t0)
    vals.sort()
    return vals[len(vals) // 2]


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    import tmae_tpu.ops.pallas_encoder as pe
    from tmae_tpu.ops.dense_windows import window_view, window_unview, slot_pos_embed

    rtt = timed(jax.jit(lambda: jnp.float32(0.0)))
    print(f'rtt {rtt*1e3:7.2f} ms', flush=True)

    rng = np.random.RandomState(0)
    C, F, T, H = 128, 256, 64, 8

    def enc_args(N, dtype=jnp.bfloat16):
        xw = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * .3).astype(dtype)
        qm = jnp.asarray((rng.rand(N, T) < 0.5).astype(np.float32))
        pos = jnp.asarray(rng.randn(T, C).astype(np.float32) * .3)
        w = lambda a, b: jnp.asarray(rng.randn(a, b).astype(np.float32) * .05)
        v = lambda a: jnp.asarray(rng.randn(a).astype(np.float32) * .05)
        params = (w(C, C), v(C), w(C, C), v(C), w(C, C), v(C), w(C, C), v(C),
                  jnp.asarray([0.7]), jnp.ones(C), v(C), w(C, F), v(F),
                  w(F, C), v(C), jnp.ones(C), v(C))
        return (xw, xw, qm, qm, pos) + params

    for dtype in (jnp.bfloat16, jnp.float32):
        for N, tag in ((7200, 'scale1 x2frames'), (1860, 'scale2')):
            args = enc_args(N, dtype)
            f = jax.jit(lambda *a: jnp.sum(
                pe.fused_encoder_layer(*a, 8, 0.01, False).astype(jnp.float32)))
            t = timed(f, *args)
            print(f'encoder fwd N={N:5d} {jnp.dtype(dtype).name:9s} ({tag}): {(t-rtt)*1e3:7.2f} ms', flush=True)

    # window view/unview roundtrip at full grid
    x = jnp.asarray(rng.randn(2, 468, 468, C).astype(np.float32))

    @jax.jit
    def f_view(x):
        w = window_view(x, 8, False)
        y = window_unview(w, (468, 468), 8, False)
        w2 = window_view(y, 8, True)
        y2 = window_unview(w2, (468, 468), 8, True)
        return jnp.sum(y2)

    print(f'view/unview x2 roundtrips:    {(timed(f_view, x)-rtt)*1e3:7.2f} ms', flush=True)

    # masked dense SubM conv at full grid (bf16)
    from tmae_tpu.models.layers import SubMConvBlock
    occ = jnp.asarray(rng.rand(2, 468, 468) < 0.2)
    blk = SubMConvBlock(128)
    vb = blk.init(jax.random.PRNGKey(0), x, occ, False)
    f_conv = jax.jit(lambda x, occ: jnp.sum(blk.apply(vb, x, occ, False)))
    print(f'SubMConv 3x3 @468^2 (x2 B):   {(timed(f_conv, x, occ)-rtt)*1e3:7.2f} ms', flush=True)

    # plain dense conv for comparison
    wc = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * .05)

    @jax.jit
    def f_plain(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), wc.astype(jnp.bfloat16), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(y.astype(jnp.float32))

    print(f'plain conv 3x3 @468^2 (x2 B): {(timed(f_plain, x)-rtt)*1e3:7.2f} ms', flush=True)

    # the pos-embed add + masking elementwise pass
    @jax.jit
    def f_elem(x, occ):
        y = jnp.where(occ[..., None], x * 1.01 + 0.5, 0.0)
        return jnp.sum(y)

    print(f'elementwise pass @468^2:      {(timed(f_elem, x, occ)-rtt)*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
