#!/usr/bin/env python
"""Op-level device-time profile of the full-size serving forward: runs the
jitted two-frame inference under jax.profiler.trace and aggregates XPlane
device events by op name (jax.profiler.ProfileData — no TF/TensorBoard UI
needed). Prints the top ops and a category rollup.

Usage: python tools/profile_trace.py [--train] [--reps N]
"""

from __future__ import annotations

import collections
import glob
import re
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import build_detector, centerpoint_predict

    reps = 6
    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    _, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    dev = {k: jnp.asarray(v) for k, v in batch.items()
           if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev',
                    'pv_cur', 'pvalid_cur', 'vcoords_cur', 'vmask_cur',
                    'pv_prv', 'pvalid_prv', 'vcoords_prv', 'vmask_prv',
                    'vmean_cur', 'vends_cur', 'vmean_prv', 'vends_prv')}
    model = build_detector(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), dev)

    @jax.jit
    def infer(variables, b):
        out = model.apply(variables, b, train=False)
        return centerpoint_predict(cfg, out, nms_on_device=False,
                                   exact_topk=True)

    jax.block_until_ready(infer(variables, dev))
    tmp = tempfile.mkdtemp(prefix='xtrace_')
    with jax.profiler.trace(tmp):
        for _ in range(reps):
            r = infer(variables, dev)
        jax.block_until_ready(r)

    files = glob.glob(f'{tmp}/**/*.xplane.pb', recursive=True)
    assert files, f'no xplane under {tmp}'
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(sorted(files)[-1], 'rb').read())
    per_op = collections.Counter()
    for plane in pd.planes:
        if 'TPU' not in plane.name and 'device' not in plane.name.lower():
            continue
        for line in plane.lines:
            if 'XLA Ops' not in line.name and 'Ops' not in line.name:
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    total = sum(per_op.values())
    print(f'total device op time: {total / 1e6 / reps:.2f} ms/rep '
          f'({len(per_op)} distinct ops)')

    def cat(name):
        n = name.lower()
        if 'custom-call' in n or 'tpu_custom_call' in n:
            return 'pallas'
        if 'convolution' in n or 'conv' in n:
            return 'conv'
        if 'fusion' in n:
            return 'fusion'
        if 'sort' in n:
            return 'sort'
        if 'scatter' in n:
            return 'scatter'
        if 'gather' in n:
            return 'gather'
        if 'copy' in n or 'transpose' in n or 'reshape' in n or 'pad' in n:
            return 'copy/pad'
        if 'reduce' in n or 'cumsum' in n:
            return 'reduce'
        if 'dot' in n:
            return 'dot'
        return 'other'

    by_cat = collections.Counter()
    for k, v in per_op.items():
        by_cat[cat(k)] += v
    print('\n-- by category (ms/rep) --')
    for k, v in by_cat.most_common():
        print(f'{k:12s}{v / 1e6 / reps:8.2f}')
    print('\n-- top 40 ops (ms/rep) --')
    for k, v in per_op.most_common(40):
        print(f'{v / 1e6 / reps:8.3f}  {k[:110]}')


if __name__ == '__main__':
    main()
