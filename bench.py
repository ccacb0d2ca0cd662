#!/usr/bin/env python
"""Benchmark: full-size T-MAE finetune model (CenterPoint + SiamWCA, ONCE 468x468
grid) inference throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no throughput number (SURVEY.md §6); its
inference-speed harness exists but has no recorded output. The north star is
"≥2x A100 frames/sec/chip". We document the assumed A100 reference throughput for
this model at ~20 frames/sec (A100 CenterPoint-SST class models run 15-25 fps at
batch 1 in OpenPCDet-style stacks), so vs_baseline = fps / (2 * 20).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

ASSUMED_A100_FPS = 20.0
TARGET_FPS = 2 * ASSUMED_A100_FPS


def main():
    import jax

    cache_dir = REPO / '.jax_cache'
    cache_dir.mkdir(exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import (
        build_detector, centerpoint_predict, host_nms,
    )

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=1, training=False,
        runtime_cfg=cfg.RUNTIME, seed=0,
    )
    model = build_detector(cfg)
    batch = next(iter(loader))
    dev_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev')
    }
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, train=False)
    )(jax.random.PRNGKey(0), dev_batch)

    @jax.jit
    def infer(variables, b):
        out = model.apply(variables, b, train=False)
        # decode on device; rotated NMS runs on host (C++ host-ops)
        return centerpoint_predict(cfg, out, nms_on_device=False)

    def full_infer(b):
        boxes, scores, labels, valid = jax.device_get(infer(variables, b))
        valid = host_nms(cfg, boxes, scores, labels, valid)
        return valid

    # warmup / compile (includes the host-NMS library build)
    full_infer(dev_batch)
    # timed reps (reference eval_infer_speed: 200 reps with warmup slicing,
    # eval_utils.py:57-77; we use 20 reps to bound bench time). Each rep fetches
    # results to host and runs NMS there — a full end-to-end inference.
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        res = full_infer(dev_batch)
    dt = time.perf_counter() - t0
    fps = reps * dev_batch['points'].shape[0] / dt
    print(json.dumps({
        'metric': 'finetune_inference_frames_per_sec_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/s',
        'vs_baseline': round(fps / TARGET_FPS, 3),
    }))


if __name__ == '__main__':
    main()
