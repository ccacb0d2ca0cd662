#!/usr/bin/env python
"""Occupied-window census over synthetic lidar frames: sizes the compaction
caps (RUNTIME.OCC_*_CAPS) for a given point density (VERDICT r3 #3 —
re-justify caps at production density, ~100k points/frame like real ONCE).

Counts, per pyramid stride (1/2/4) and shift, the windows falling into the
small (<=16 occupied cells), mid (<=48), and full (>48) buckets using the
exact classification of ops/occ_compact.build_bucketed_compact_info — for
the single-frame SST stages and the coupled two-frame WCA stages (bucket =
max of the two frames' counts).

Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/occupancy_census.py \
      [--points 100000] [--frames 16] [--small 16] [--mid 48]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def window_counts(occ: np.ndarray, window: int, shift: bool) -> np.ndarray:
    """occ [H, W] bool → per-window occupied-cell counts (padded grid)."""
    H, W = occ.shape
    off = window // 2 if shift else window
    nwy = (H + off + window - 1) // window + (1 if shift else 0)
    # replicate window_geometry: pad so the (possibly shifted) grid tiles
    Hp = ((H + off + window - 1) // window) * window
    pad = np.zeros((Hp, Hp), np.int32)
    pad[off:off + H, off:off + W] = occ.astype(np.int32)
    nw = Hp // window
    return pad.reshape(nw, window, nw, window).sum(axis=(1, 3))


def census(occ_cur, occ_prv, window, small_tokens, mid_tokens):
    out = {}
    for shift in (False, True):
        for mode, (a, b) in (('single', (occ_cur, None)),
                             ('coupled', (occ_cur, occ_prv))):
            ca = window_counts(a, window, shift)
            n_eff = ca
            occupied = ca > 0
            if b is not None:
                cb = window_counts(b, window, shift)
                n_eff = np.maximum(ca, cb)
                occupied = occupied | False  # coupled keeps cur-occupied rule
            small = int((occupied & (n_eff <= small_tokens)).sum())
            mid = int((occupied & (n_eff > small_tokens)
                       & (n_eff <= mid_tokens)).sum())
            full = int((occupied & (n_eff > mid_tokens)).sum())
            nomid_full = mid + full
            key = (mode, shift)
            out[key] = (small, mid, full, nomid_full, int(occupied.sum()))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--points', type=int, default=100000)
    ap.add_argument('--frames', type=int, default=16)
    ap.add_argument('--small', type=int, default=16)
    ap.add_argument('--mid', type=int, default=48)
    ap.add_argument('--density', type=float, default=1.0)
    args = ap.parse_args()

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    cfg.DATA_CONFIG.SYNTHETIC_POINTS = args.points
    cfg.DATA_CONFIG.NUM_SYNTHETIC_SAMPLES = args.frames
    cfg.DATA_CONFIG.SYNTHETIC_DENSITY = args.density
    cfg.RUNTIME.MAX_POINTS = 131072
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    pr = np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float32)
    vox = 0.32

    per_stride = {1: [], 2: [], 4: []}
    npts = []
    for bi, batch in enumerate(loader):
        if bi >= args.frames:
            break
        occs = {}
        for which in ('', '_prev'):
            pts = np.asarray(batch['points' + which][0])
            m = np.asarray(batch['point_mask' + which][0])
            ix = np.clip(((pts[m, 0] - pr[0]) / vox).astype(int), 0, 467)
            iy = np.clip(((pts[m, 1] - pr[1]) / vox).astype(int), 0, 467)
            og = np.zeros((468, 468), bool)
            og[iy, ix] = True
            occs[which] = og
            if which == '':
                npts.append(int(m.sum()))
        cur, prv = occs[''], occs['_prev']
        for stride in (1, 2, 4):
            if stride > 1:
                h = 468 // stride * stride
                ds = lambda o: o[:h, :h].reshape(
                    h // stride, stride, h // stride, stride).any(axis=(1, 3))
                c, p = ds(cur), ds(prv)
            else:
                c, p = cur, prv
            per_stride[stride].append(
                census(c, p, 8, args.small, args.mid))

    print(f'points/frame: mean {np.mean(npts):.0f} max {np.max(npts)}')
    for stride in (1, 2, 4):
        rows = per_stride[stride]
        print(f'\n-- stride {stride} --')
        for mode in ('single', 'coupled'):
            for shift in (False, True):
                vals = np.array([r[(mode, shift)] for r in rows])
                mx = vals.max(axis=0)
                print(f'{mode:8s} shift={int(shift)}  small<= {mx[0]:5d}  '
                      f'mid {mx[1]:5d}  full {mx[2]:5d}  '
                      f'full(no-mid) {mx[3]:5d}  occupied {mx[4]:5d}  (max over '
                      f'{len(rows)} frames)')
        # suggested caps: 1.4x max over both shifts/modes, rounded to 16
        allv = np.array([r[k] for r in rows for k in r])
        sug = lambda c: int(np.ceil(1.4 * c / 16) * 16)
        print(f'suggested caps (1.4x max, /16): small {sug(allv[:, 0].max())} '
              f'mid {sug(allv[:, 1].max())} full {sug(allv[:, 2].max())} '
              f'full-no-mid {sug(allv[:, 3].max())}')


if __name__ == '__main__':
    main()
