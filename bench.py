#!/usr/bin/env python
"""Benchmark: full-size T-MAE finetune model (CenterPoint + SiamWCA, ONCE 468x468
grid) inference throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline basis (see BASELINE.md): the reference publishes NO throughput number
(SURVEY.md §6) — its inference-speed harness (`eval_utils.py:57-77`) has no
recorded output. The north star is "≥2x A100 frames/sec/chip". A100 anchor used
here: SST-class single-stride transformer detectors report ~3.6 fps on a 2080ti
in the SST paper (CVPR'22); an A100 is ~2.5-3x a 2080ti on such workloads, and
T-MAE runs the SST encoder twice (two frames) plus WCA cross-attention. 15-25
fps at batch 1 on A100 brackets the plausible range; we keep 20 fps as the
documented anchor => target = 2 x 20 = 40 fps.

Robustness: the measurement runs in a CHILD process that streams partial
results; the PARENT enforces a wall-clock deadline (BENCH_BUDGET_S, default
480 s) that works even while the child is blocked inside a long XLA compile
(where in-process signal handlers cannot fire). The parent always prints
exactly one JSON line — the child's final result, or the last streamed
partial, or a zero-value record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

ASSUMED_A100_FPS = 20.0
TARGET_FPS = 2 * ASSUMED_A100_FPS
BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', '480'))

ZERO = {
    'metric': 'finetune_inference_frames_per_sec_per_chip',
    'value': 0.0,
    'unit': 'frames/s',
    'vs_baseline': 0.0,
}


def child():
    import jax

    cache_dir = REPO / '.jax_cache'
    cache_dir.mkdir(exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from tmae_tpu.config import cfg_from_yaml_file
    from tmae_tpu.datasets.dataset import build_dataloader
    from tmae_tpu.models.detectors import (
        build_detector, centerpoint_predict, host_nms,
    )

    t_start = time.perf_counter()

    def note(msg):
        sys.stderr.write(f'bench[child] t={time.perf_counter()-t_start:.0f}s '
                         f'{msg}\n')
        sys.stderr.flush()

    cfg = cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
    # BENCH_BATCH > 1 measures batched serving throughput (frames/sec/chip
    # still counts every frame); the driver-facing default stays at the
    # reference harness's batch 1 (eval_utils.py:57-77)
    bench_batch = int(os.environ.get('BENCH_BATCH', '1'))
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=bench_batch,
        training=False, runtime_cfg=cfg.RUNTIME, seed=0,
    )
    model = build_detector(cfg)
    batch = next(iter(loader))
    dev_batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if k in ('points', 'point_mask', 'points_prev', 'point_mask_prev')
    }
    note('data ready')
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, train=False)
    )(jax.random.PRNGKey(0), dev_batch)
    note('params ready')

    # BENCH_NMS=device keeps rotated NMS on device. Host is the default:
    # the K=500 candidates ship to the host anyway (they ARE the result), the
    # C++ NMS costs ~0.1 ms there, while the device rotated-IoU matrix
    # currently costs ~300 ms (measured; a Pallas IoU kernel is the known
    # gap). Equivalence of the two paths: tests/test_nms_device_host.py.
    nms_device = os.environ.get('BENCH_NMS', 'host') == 'device'

    @jax.jit
    def infer(variables, b):
        out = model.apply(variables, b, train=False)
        # serving hot path: approximate top-k (recall 0.99); eval uses exact
        return centerpoint_predict(cfg, out, nms_on_device=nms_device,
                                   exact_topk=False)

    def full_infer(b):
        boxes, scores, labels, valid = jax.device_get(infer(variables, b))
        if not nms_device:
            valid = host_nms(cfg, boxes, scores, labels, valid)
        return valid

    # warmup / compile (includes the host-NMS library build)
    full_infer(dev_batch)
    note('warmup done')

    def emit(tag, fps):
        print(json.dumps({
            'tag': tag,
            'metric': 'finetune_inference_frames_per_sec_per_chip',
            'value': round(fps, 3),
            'unit': 'frames/s',
            'vs_baseline': round(fps / TARGET_FPS, 3),
        }), flush=True)

    # timed reps (reference eval_infer_speed: 200 reps with warmup slicing,
    # eval_utils.py:57-77; 30 reps here bounds bench time). Double-buffered:
    # dispatch frame i+1 before fetching frame i's results — every frame's
    # boxes still reach the host (+ host NMS there), but the relay round-trip
    # overlaps device compute. This measures steady-state THROUGHPUT, the
    # metric the frames/sec/chip target names.
    import collections

    reps = 30
    depth = int(os.environ.get('BENCH_PIPELINE_DEPTH', '4'))
    done = 0
    t0 = time.perf_counter()
    inflight = collections.deque()
    for _ in range(reps):
        inflight.append(infer(variables, dev_batch))
        if len(inflight) >= depth:
            boxes, scores, labels, valid = jax.device_get(inflight.popleft())
            if not nms_device:
                host_nms(cfg, boxes, scores, labels, valid)
            done += 1
            emit('partial', done * dev_batch['points'].shape[0] /
                 (time.perf_counter() - t0))
    while inflight:
        boxes, scores, labels, valid = jax.device_get(inflight.popleft())
        if not nms_device:
            host_nms(cfg, boxes, scores, labels, valid)
        done += 1
    fps = done * dev_batch['points'].shape[0] / (time.perf_counter() - t0)
    emit('final', fps)

    # optional STREAMING serving measurement (stderr note only): on
    # consecutive frames the prev-frame pyramid equals the previous step's
    # cur pyramid, so the serving path carries it forward (cached_prev /
    # return_hidden on CenterPoint) and skips half the SST encoder. The
    # driver metric above stays the stateless two-frame forward (the
    # reference harness's semantics, eval_utils.py:57-77).
    if os.environ.get('BENCH_STREAMING'):
        @jax.jit
        def infer_stream(variables, b, cached):
            out = model.apply(variables, b, train=False,
                              cached_prev=cached, return_hidden=True)
            preds = centerpoint_predict(cfg, out, nms_on_device=nms_device,
                                        exact_topk=False)
            return preds, out['hidden_cur']

        preds, hidden = infer_stream(variables, dev_batch, None)
        jax.block_until_ready(hidden)
        # warm the steady-state graph (cached != None) before timing
        preds, hidden = infer_stream(variables, dev_batch, hidden)
        jax.block_until_ready(hidden)
        t0 = time.perf_counter()
        n = 0
        inflight = collections.deque()
        for _ in range(reps):
            preds, hidden = infer_stream(variables, dev_batch, hidden)
            inflight.append(preds)
            if len(inflight) >= depth:
                boxes, scores, labels, valid = jax.device_get(
                    inflight.popleft())
                if not nms_device:
                    host_nms(cfg, boxes, scores, labels, valid)
                n += 1
        while inflight:
            boxes, scores, labels, valid = jax.device_get(inflight.popleft())
            if not nms_device:
                host_nms(cfg, boxes, scores, labels, valid)
            n += 1
        sfps = n * dev_batch['points'].shape[0] / (time.perf_counter() - t0)
        note(f'streaming serving (cached prev pyramid): {sfps:.2f} fps')

    # optional occupancy-sensitivity sweep (stderr notes only; the driver
    # JSON above is unchanged): re-render the lidar scene at 0.5x/2x
    # azimuthal density — same static shapes, so no recompile — and report
    # fps + occupied-window counts vs the compaction caps (VERDICT r2 #7)
    if os.environ.get('BENCH_DENSITY_SWEEP'):
        import numpy as np
        for dens in (0.5, 2.0):
            dcfg = cfg_from_yaml_file(
                REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')
            dcfg.DATA_CONFIG.SYNTHETIC_DENSITY = dens
            _, dloader = build_dataloader(
                dcfg.DATA_CONFIG, dcfg.CLASS_NAMES, batch_size=bench_batch,
                training=False, runtime_cfg=dcfg.RUNTIME, seed=0,
            )
            db = next(iter(dloader))
            ddev = {k: jnp.asarray(v) for k, v in db.items()
                    if k in dev_batch}
            # occupied stride-1 windows of the current frame (host count)
            pts = np.asarray(db['points'][0])
            m = np.asarray(db['point_mask'][0])
            pr = np.asarray(dcfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float32)
            ix = np.clip(((pts[m, 0] - pr[0]) / 0.32).astype(int), 0, 467)
            iy = np.clip(((pts[m, 1] - pr[1]) / 0.32).astype(int), 0, 467)
            og = np.zeros((468, 468), bool)
            og[iy, ix] = True
            op = np.zeros((472, 472), bool)
            op[:468, :468] = og
            nwin = int(op.reshape(59, 8, 59, 8).any(axis=(1, 3)).sum())
            full_infer(ddev)
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                full_infer(ddev)
            dfps = n * ddev['points'].shape[0] / (time.perf_counter() - t0)
            note(f'density {dens}x: {dfps:.2f} fps (unpipelined), '
                 f'{int(m.sum())} pts, {nwin} occupied stride-1 windows '
                 f'(caps {dcfg.RUNTIME.get("OCC_SMALL_CAPS")} small + '
                 f'{dcfg.RUNTIME.get("OCC_WINDOW_CAPS")} full)')


def parent():
    deadline = time.monotonic() + BUDGET_S
    proc = subprocess.Popen(
        [sys.executable, str(Path(__file__).resolve()), '--child'],
        stdout=subprocess.PIPE, text=True, cwd=str(REPO),
    )
    last = [None]

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if 'value' in rec:
                last[0] = rec

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    while proc.poll() is None and time.monotonic() < deadline:
        time.sleep(0.5)
    if proc.poll() is None:
        sys.stderr.write('bench: deadline hit, killing child\n')
        proc.kill()
        proc.wait()
    t.join(timeout=5)
    rec = dict(last[0]) if last[0] else dict(ZERO)
    rec.pop('tag', None)
    print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    if '--child' in sys.argv:
        child()
    else:
        parent()
