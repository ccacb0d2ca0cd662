#!/usr/bin/env python
"""Compile-time breakdown + persistent-cache diagnostics for the serving graph.

Times, separately (AOT lower/compile so compile is isolated from run):
  - model.init
  - stage A: unbucketed compact plan (round-2 style, OCC_SMALL/MID = 0)
  - stage B: small+full buckets (no mid)
  - stage C: small+mid+full buckets (round-3 default)

Also: counts distinct tpu_custom_call payloads per HLO, and exercises the
persistent compile cache with error-raising + debug logging to find out why
round 3's 458 s compile neither hit nor wrote `.jax_cache` (VERDICT r3 #1).

Run on TPU:  timeout 3500 python tools/profile_compile.py
"""
from __future__ import annotations

import collections
import hashlib
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

cache_dir = REPO / '.jax_cache_diag'
cache_dir.mkdir(exist_ok=True)
jax.config.update('jax_compilation_cache_dir', str(cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_raise_persistent_cache_errors', True)
logging.basicConfig(level=logging.WARNING)
for mod in ('jax._src.compilation_cache', 'jax._src.compiler',
            'jax._src.cache_key'):
    logging.getLogger(mod).setLevel(logging.DEBUG)
    logging.getLogger(mod).addHandler(logging.StreamHandler(sys.stderr))

import jax.numpy as jnp

from tmae_tpu.config import cfg_from_yaml_file
from tmae_tpu.datasets.dataset import build_dataloader
from tmae_tpu.models.detectors import build_detector, centerpoint_predict

T0 = time.perf_counter()


def note(msg):
    print(f'[t={time.perf_counter()-T0:7.1f}s] {msg}', flush=True)


def payload_census(lowered):
    """Count tpu_custom_call instances and distinct backend_config payloads."""
    txt = lowered.as_text()
    total = 0
    uniq = collections.Counter()
    for line in txt.splitlines():
        if 'tpu.custom_call' in line or 'custom_call_target = "tpu_custom_call"' in line or '"tpu_custom_call"' in line:
            total += 1
            h = hashlib.sha1(line.encode()).hexdigest()[:10]
            # hash only the payload-looking part to group identical kernels
            uniq[h] += 1
    return total, len(uniq)


def build(caps, small, mid):
    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    cfg.RUNTIME.OCC_WINDOW_CAPS = list(caps)
    cfg.RUNTIME.OCC_SMALL_CAPS = list(small)
    cfg.RUNTIME.OCC_MID_CAPS = list(mid)
    return cfg


def main():
    cfg0 = build([112, 48, 32], [640, 224, 112], [128, 64, 48])
    dataset, loader = build_dataloader(
        cfg0.DATA_CONFIG, cfg0.CLASS_NAMES, batch_size=1,
        training=False, runtime_cfg=cfg0.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    dev_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev')
    }
    note('data ready')

    model0 = build_detector(cfg0)
    t = time.perf_counter()
    variables = jax.jit(
        lambda rng, b: model0.init(rng, b, train=False)
    )(jax.random.PRNGKey(0), dev_batch)
    jax.block_until_ready(variables)
    note(f'init compiled+ran in {time.perf_counter()-t:.1f}s')

    stages = [
        ('A_unbucketed', build([1024, 384, 128], [0, 0, 0], [0, 0, 0])),
        ('B_small_full', build([112, 48, 32], [640, 224, 112], [0, 0, 0])),
        ('C_small_mid_full', cfg0),
    ]
    for name, cfg in stages:
        model = build_detector(cfg)

        def infer(variables, b):
            out = model.apply(variables, b, train=False)
            return centerpoint_predict(cfg, out, nms_on_device=False,
                                       exact_topk=False)

        t = time.perf_counter()
        lowered = jax.jit(infer).lower(variables, dev_batch)
        t_lower = time.perf_counter() - t
        total, uniq = payload_census(lowered)
        note(f'{name}: lowered in {t_lower:.1f}s; '
             f'tpu_custom_call sites={total} uniq-lines={uniq}')
        t = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t
        note(f'{name}: compiled in {t_comp:.1f}s')
        t = time.perf_counter()
        out = compiled(variables, dev_batch)
        jax.block_until_ready(out)
        note(f'{name}: first run {time.perf_counter()-t:.2f}s')
        t = time.perf_counter()
        for _ in range(5):
            out = compiled(variables, dev_batch)
        jax.block_until_ready(out)
        note(f'{name}: 5 reps avg {(time.perf_counter()-t)/5*1000:.1f} ms')
        ents = list(cache_dir.glob('*'))
        note(f'{name}: cache entries now: {len(ents)}')

    for e in sorted(cache_dir.glob('*')):
        note(f'cache entry: {e.name[:60]} {e.stat().st_size}B')


if __name__ == '__main__':
    main()
