#!/usr/bin/env python
"""Single encoder-layer A/B at production stage-1 shapes: the combined-bucket
gather + row kernels + scatter chain vs the fused in-place DMA kernels
(pallas_encoder fused section). Scan-slope timing on the attached TPU."""

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
    from tmae_tpu.ops import pallas_encoder as pe
    from tmae_tpu.ops.dense_windows import slot_pos_embed

    rng = np.random.RandomState(0)
    B, H, W, C, F, nhead, w = 2, 468, 468, 128, 256, 8, 8
    # production-like clustered occupancy: ~6.8k cells in ~950 windows/frame
    occ = np.zeros((B, H, W), bool)
    for b in range(B):
        centers = rng.randint(0, H - 24, size=(140, 2))
        for cy, cx in centers:
            blob = rng.rand(24, 24) < 0.12
            occ[b, cy:cy + 24, cx:cx + 24] |= blob
    print('cells/frame:', occ.sum(1).sum(-1) // 1, flush=True)
    x = np.where(occ[..., None], rng.randn(B, H, W, C), 0).astype(np.float32)

    import os
    # TMAE_FUSED_TW=32 pairs with 32-divisible caps (192 mid)
    mid = 192 if int(os.environ.get('TMAE_FUSED_TW', '16')) == 32 else 176
    caps = dict(small_cap=640, full_cap=128, small_tokens=16,
                mid_cap=mid, mid_tokens=48)
    bc = jax.jit(lambda o: oc.build_bucketed_compact_info(
        o, w, False, caps['small_cap'], caps['full_cap'], (H, W),
        small_tokens=caps['small_tokens'], mid_cap=caps['mid_cap'],
        mid_tokens=caps['mid_tokens']))(jnp.asarray(occ))
    xp0 = jax.jit(lambda a: oc.pad_grid(a, w, False))(
        jnp.asarray(x, jnp.bfloat16))

    params = []
    shapes = [(C, C), (C,), (C, C), (C,), (C, C), (C,), (C, C), (C,), (1,),
              (C,), (C,), (C, F), (F,), (F, C), (C,), (C,), (C,)]
    for s in shapes:
        params.append(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05))
    params[8] = jnp.ones((1,), jnp.float32)
    P = tuple(params)
    pos = slot_pos_embed(w, C).astype(jnp.bfloat16)

    def scan_time(name, fn, reps_pair=(16, 48)):
        ts = []
        for reps in reps_pair:
            @jax.jit
            def loop():
                def body(c, _):
                    return jnp.sum(fn(c).astype(jnp.float32)) * 1e-30, None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=reps)
                return out
            _ = jax.device_get(loop())
            t0 = time.perf_counter()
            _ = jax.device_get(loop())
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (reps_pair[1] - reps_pair[0]) * 1e3
        print(f'{name:34s}{dt:8.3f} ms', flush=True)
        return dt

    def layer_combined(c):
        xp = xp0 + c * jnp.asarray(1e-30, xp0.dtype)
        xw_all = oc.gather_windows_padded(xp, bc.cat_idx, w)
        lo = 0
        for si in (bc.small, bc.mid):
            xw_all = pe.encoder_layer_rows_sel(
                xw_all, None, si.sel, si.sel, si.qmask, si.qmask, pos, *P,
                nhead=nhead, tau_min=0.01, cross=False, row_lo=lo)
            lo += si.idx.shape[1]
        xw_all = pe.encoder_layer_rows_full(
            xw_all, None, bc.full.qmask, bc.full.qmask, pos, *P,
            nhead=nhead, tau_min=0.01, cross=False, row_lo=lo)
        return oc.scatter_windows_into_padded(xw_all, bc.cat_idx, xp, w)

    def layer_fused(c):
        xp = xp0 + c * jnp.asarray(1e-30, xp0.dtype)
        for si in (bc.small, bc.mid):
            xp = pe.encoder_layer_fused_inplace(
                xp, None, si, pos, *P, nhead=nhead, tau_min=0.01,
                cross=False, window=w, sel=True)
        return pe.encoder_layer_fused_inplace(
            xp, None, bc.full, pos, *P, nhead=nhead, tau_min=0.01,
            cross=False, window=w, sel=False)

    scan_time('combined (gather+rows+scatter)', layer_combined)
    scan_time('fused in-place (3 calls)', layer_fused)
    if hasattr(pe, 'encoder_layer_fused_pipelined'):
        def layer_piped(c):
            xp = xp0 + c * jnp.asarray(1e-30, xp0.dtype)
            for si in (bc.small, bc.mid):
                xp = pe.encoder_layer_fused_pipelined(
                    xp, None, si, pos, *P, nhead=nhead, tau_min=0.01,
                    cross=False, window=w, sel=True)
            return pe.encoder_layer_fused_pipelined(
                xp, None, bc.full, pos, *P, nhead=nhead, tau_min=0.01,
                cross=False, window=w, sel=False)
        scan_time('fused pipelined (3 calls)', layer_piped)


if __name__ == '__main__':
    main()
