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

Robustness (VERDICT r3 #1 — the bench must survive a COLD compile cache within
the driver's 480 s budget):

* The measurement runs in a CHILD process streaming partial results; the
  PARENT enforces the wall-clock deadline (BENCH_BUDGET_S, default 480 s) and
  always prints exactly one JSON line — the child's final result, else the
  last streamed partial, else a zero record. The deadline works even while
  the child is blocked inside a long XLA compile.
* STAGED measurement inside the child: params come from a TINY-GRID init
  (param shapes are grid/cap-independent — seconds instead of ~54 s), then
  stage A compiles the fast round-2-style unbucketed compact graph (~40 s
  measured cold) and emits a partial ≥16.5 fps, then stage B compiles the
  token-bucketed serving graph (~130 s measured cold) and emits the upgraded
  final number. If the compile service is cold/slow and stage B misses the
  deadline, the parent keeps stage A's partial instead of 0.0.
* The persistent compile cache (.jax_cache) is written on first run
  (verified working on the axon backend, tools/profile_compile.py), making
  warm re-runs near-instant; the staging above is what makes the COLD run
  safe and does not rely on the cache.
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
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
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

    def load_cfg():
        return cfg_from_yaml_file(REPO / 'tools/cfgs/once_models/t_mae_synth.yaml')

    cfg = load_cfg()
    # BENCH_BATCH > 1 measures batched serving throughput (frames/sec/chip
    # still counts every frame); the driver-facing default stays at the
    # reference harness's batch 1 (eval_utils.py:57-77)
    bench_batch = int(os.environ.get('BENCH_BATCH', '1'))
    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=bench_batch,
        training=False, runtime_cfg=cfg.RUNTIME, seed=0,
    )
    batch = next(iter(loader))
    MODEL_INPUTS = (
        'points', 'point_mask', 'points_prev', 'point_mask_prev',
        # host-precomputed voxelization (RUNTIME.HOST_VOXELIZE)
        'pv_cur', 'pvalid_cur', 'vcoords_cur', 'vmask_cur',
        'pv_prv', 'pvalid_prv', 'vcoords_prv', 'vmask_prv',
        'vmean_cur', 'vends_cur', 'vmean_prv', 'vends_prv',
    )
    if os.environ.get('BENCH_NO_SORTED_VFE'):  # A/B: drop the sorted-VFE extras
        MODEL_INPUTS = MODEL_INPUTS[:-4]
    dev_batch = {
        k: jnp.asarray(v) for k, v in batch.items() if k in MODEL_INPUTS
    }
    note('data ready')

    # --- tiny-grid init: same MODEL section => identical param tree, but the
    # init forward traces a 64x64 grid with small caps (seconds, not ~54 s)
    tiny = load_cfg()
    tiny.DATA_CONFIG.POINT_CLOUD_RANGE = [-10.24, -10.24, -5.0, 10.24, 10.24, 3.0]
    tiny.DATA_CONFIG.NUM_SYNTHETIC_SAMPLES = 2
    tiny.DATA_CONFIG.SYNTHETIC_POINTS = 2000
    tiny.DATA_CONFIG.SYNTHETIC_BOXES = 4
    tiny.RUNTIME.MAX_POINTS = 4096
    tiny.RUNTIME.MAX_VOXELS = [4096, 2048, 1024]
    tiny.RUNTIME.OCC_WINDOW_CAPS = [64, 32, 16]
    tiny.RUNTIME.OCC_SMALL_CAPS = [0, 0, 0]
    tiny.RUNTIME.OCC_MID_CAPS = [0, 0, 0]
    _, tiny_loader = build_dataloader(
        tiny.DATA_CONFIG, tiny.CLASS_NAMES, batch_size=bench_batch,
        training=False, runtime_cfg=tiny.RUNTIME, seed=0,
    )
    tb = next(iter(tiny_loader))
    tiny_batch = {k: jnp.asarray(v) for k, v in tb.items() if k in dev_batch}
    tiny_model = build_detector(tiny)
    from tmae_tpu.ops import occ_compact as _oc0
    _oc0._NO_MULTI = True  # cheap-compile kernels for the throwaway init
    try:
        variables = jax.jit(
            lambda rng, b: tiny_model.init(rng, b, train=False)
        )(jax.random.PRNGKey(0), tiny_batch)
        jax.block_until_ready(variables)
    finally:
        _oc0._NO_MULTI = False
    note('params ready (tiny-grid init)')

    # BENCH_NMS=device keeps rotated NMS on device. Host is the default:
    # the K=500 candidates ship to the host anyway (they ARE the result), the
    # C++ NMS costs ~2.4 ms there and is hidden by the pipelined dispatch,
    # while the device NMS burns device time (13.7 ms measured r3).
    # Equivalence of the two paths: tests/test_nms_device_host.py.
    nms_device = os.environ.get('BENCH_NMS', 'host') == 'device'

    # BENCH_TOPK=approx opts into approx_max_k (recall 0.99, ~0.3 ms less);
    # the DEFAULT is the exact blocked top-K the eval path uses
    # (ops/centernet.exact_topk_flat) — the headline number measures the
    # decode eval actually runs (VERDICT r4 #4)
    exact = os.environ.get('BENCH_TOPK', 'exact') == 'exact'

    def make_infer(stage_cfg):
        model = build_detector(stage_cfg)

        @jax.jit
        def infer(variables, b):
            out = model.apply(variables, b, train=False)
            return centerpoint_predict(stage_cfg, out, nms_on_device=nms_device,
                                       exact_topk=exact)
        return model, infer

    # analytic model FLOPs per frame -> report achieved MFU beside fps
    # (tmae_tpu/utils/flops.py; XLA cost_analysis can't see into Pallas calls)
    from tmae_tpu.utils.flops import V5E_PEAK_BF16, model_flops_breakdown
    FLOPS_PER_FRAME = sum(
        model_flops_breakdown(cfg, batch=bench_batch).values()) / bench_batch

    def emit(tag, fps):
        print(json.dumps({
            'tag': tag,
            'metric': 'finetune_inference_frames_per_sec_per_chip',
            'value': round(fps, 3),
            'unit': 'frames/s',
            'vs_baseline': round(fps / TARGET_FPS, 3),
        }), flush=True)

    import collections

    reps = int(os.environ.get('BENCH_REPS', '30'))
    depth = int(os.environ.get('BENCH_PIPELINE_DEPTH', '4'))

    def one_pass(infer, tag, stream_partials):
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
                if stream_partials:
                    emit('partial-' + tag,
                         done * dev_batch['points'].shape[0] /
                         (time.perf_counter() - t0))
        while inflight:
            boxes, scores, labels, valid = jax.device_get(inflight.popleft())
            if not nms_device:
                host_nms(cfg, boxes, scores, labels, valid)
            done += 1
        return done * dev_batch['points'].shape[0] / (time.perf_counter() - t0)

    n_meas = int(os.environ.get('BENCH_MEASUREMENTS', '3'))

    def measure(infer, tag):
        """Pipelined throughput: dispatch frame i+1 before fetching frame i's
        results — every frame's boxes still reach the host (+ host NMS there),
        but the relay round-trip overlaps device compute. This measures
        steady-state THROUGHPUT, the metric the frames/sec/chip target names
        (reference harness: 200-rep eval_infer_speed, eval_utils.py:57-77).

        The graph is compiled by now, so repetitions cost ~reps/fps seconds
        each; the MEDIAN of n_meas passes is the reported number and the
        spread goes to stderr (relay-weather observability, VERDICT r4 #7)."""
        vals = [one_pass(infer, tag, stream_partials=(i == 0))
                for i in range(max(1, n_meas))]
        svals = sorted(vals)
        fps = svals[len(svals) // 2]
        emit(tag, fps)
        note(f'{tag}: median {fps:.2f} fps of {n_meas} passes '
             f'[{svals[0]:.2f}..{svals[-1]:.2f}] = '
             f'{FLOPS_PER_FRAME * fps / 1e12:.2f} TFLOP/s achieved, MFU '
             f'{FLOPS_PER_FRAME * fps / V5E_PEAK_BF16:.1%} '
             f'({FLOPS_PER_FRAME / 1e9:.0f} GFLOP/frame analytic)')
        return fps

    # --- stage A: round-2-style unbucketed compact graph (fast compile) ---
    stages = os.environ.get('BENCH_STAGES', 'A,B').split(',')
    if 'A' in stages:
        from tmae_tpu.ops import occ_compact as _oc

        cfg_a = load_cfg()
        cfg_a.RUNTIME.OCC_WINDOW_CAPS = [1024, 384, 128]
        cfg_a.RUNTIME.OCC_SMALL_CAPS = [0, 0, 0]
        cfg_a.RUNTIME.OCC_MID_CAPS = [0, 0, 0]
        _, infer_a = make_infer(cfg_a)
        # stage A is the compile-time floor: trace it with the BlockSpec
        # gather/scatter (the chunked-DMA kernels are ~2x slower to build;
        # stage B gets them for the final number)
        _oc._NO_MULTI = True
        try:
            full = infer_a(variables, dev_batch)
            jax.block_until_ready(full)
        finally:
            _oc._NO_MULTI = False
        if not nms_device:
            host_nms(cfg, *jax.device_get(full))  # warm the host-NMS library
        note('stage A (unbucketed) compiled + warm')
        fps_a = measure(infer_a, 'stage_a')
        note(f'stage A fps: {fps_a:.2f}')

    # --- stage B: token-bucketed serving graph (the fast tier) ---
    if 'B' in stages:
        cfg_b = load_cfg()
        _, infer_b = make_infer(cfg_b)
        full = infer_b(variables, dev_batch)
        jax.block_until_ready(full)
        note('stage B (bucketed) compiled + warm')
        fps_b = measure(infer_b, 'final')
        note(f'stage B fps: {fps_b:.2f}')

    # optional STREAMING serving measurement (stderr note only): on
    # consecutive frames the prev-frame pyramid equals the previous step's
    # cur pyramid, so the serving path carries it forward (cached_prev /
    # return_hidden on CenterPoint) and skips half the SST encoder. The
    # driver metric above stays the stateless two-frame forward (the
    # reference harness's semantics, eval_utils.py:57-77).
    if os.environ.get('BENCH_STREAMING'):
        model_b = build_detector(load_cfg())

        @jax.jit
        def infer_stream(variables, b, cached):
            out = model_b.apply(variables, b, train=False,
                                cached_prev=cached, return_hidden=True)
            preds = centerpoint_predict(cfg, out, nms_on_device=nms_device,
                                        exact_topk=exact)
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
        # tagged record for the run log; deliberately NOT the driver metric
        # ('value' absent): the temporal datasets pose-align prev points into
        # the CURRENT ego frame (once_temporal.py convert_prv_frame_to_cur),
        # so a cached pyramid is only exact when the ego is stationary —
        # streaming is a documented approximate serving mode, while the
        # driver metric stays the reference-semantics stateless forward.
        print(json.dumps({
            'tag': 'streaming_serving',
            'metric': 'streaming_inference_frames_per_sec_per_chip',
            'value_streaming': round(sfps, 3),
            'unit': 'frames/s',
        }), flush=True)

    # optional occupancy-sensitivity sweep (stderr notes only; the driver
    # JSON above is unchanged): re-render the lidar scene at 0.5x/2x
    # azimuthal density — same static shapes, so no recompile — and report
    # fps + occupied-window counts vs the compaction caps (VERDICT r2 #7)
    if os.environ.get('BENCH_DENSITY_SWEEP'):
        import numpy as np
        model_b, infer_b2 = make_infer(load_cfg())

        def full_infer(b):
            out = jax.device_get(infer_b2(variables, b))
            if not nms_device:
                host_nms(cfg, *out)
            return out

        for dens in (0.5, 2.0):
            dcfg = load_cfg()
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
