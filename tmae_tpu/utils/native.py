"""ctypes loader for the native host-ops library (tmae_tpu/csrc/host_ops.cpp).

Compiles lazily with g++ -O3 on first use (cached as libtmae_host.so next to the
source); every entry point has a pure-numpy fallback in ``ops/geometry_np.py`` /
``datasets/once_eval.py``, so the framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parent.parent / 'csrc'
_SRC = _CSRC / 'host_ops.cpp'
_LIB = _CSRC / 'libtmae_host.so'
_lib = None
_tried = False


def _build():
    cmd = [
        'g++', '-O3', '-march=native', '-shared', '-fPIC', '-fopenmp',
        str(_SRC), '-o', str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        # retry without openmp
        try:
            cmd = ['g++', '-O3', '-shared', '-fPIC', str(_SRC), '-o', str(_LIB)]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            log.warning('native host-ops build failed (%s); using numpy '
                        'fallbacks', e)
            return False


def get_lib():
    """Returns the loaded ctypes library or None (fallback mode)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as e:
        log.warning('could not load native host-ops (%s)', e)
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    c_f = ctypes.POINTER(ctypes.c_float)
    c_i64 = ctypes.POINTER(ctypes.c_int64)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    c_i8 = ctypes.POINTER(ctypes.c_int8)
    lib.tmae_intersection_area_bev.argtypes = [
        c_d, ctypes.c_int64, c_d, ctypes.c_int64, c_d]
    lib.tmae_iou3d.argtypes = [
        c_d, ctypes.c_int64, c_d, ctypes.c_int64, ctypes.c_int, c_d]
    lib.tmae_nms_bev.restype = ctypes.c_int64
    lib.tmae_nms_bev.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_double, ctypes.c_int64, c_i8]
    lib.tmae_points_in_boxes.argtypes = [
        c_f, ctypes.c_int64, c_d, ctypes.c_int64, ctypes.c_double, c_i32]
    lib.tmae_accumulate_scores.restype = ctypes.c_int64
    lib.tmae_accumulate_scores.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_int64, c_d, c_i64, c_i64,
        ctypes.c_double, c_d]
    lib.tmae_compute_statistics.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_int64, c_d, c_i64, c_i64, c_d,
        ctypes.c_int64, ctypes.c_double, c_i64]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def intersection_area_bev(boxes_a: np.ndarray, boxes_b: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(boxes_a, np.float64)
    b = np.ascontiguousarray(boxes_b, np.float64)
    out = np.empty((len(a), len(b)), np.float64)
    lib.tmae_intersection_area_bev(
        _ptr(a, ctypes.c_double), len(a), _ptr(b, ctypes.c_double), len(b),
        _ptr(out, ctypes.c_double),
    )
    return out


def iou3d(boxes_a, boxes_b, with_heading=False):
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(boxes_a, np.float64)
    b = np.ascontiguousarray(boxes_b, np.float64)
    out = np.empty((len(a), len(b)), np.float64)
    lib.tmae_iou3d(_ptr(a, ctypes.c_double), len(a), _ptr(b, ctypes.c_double),
                   len(b), int(with_heading), _ptr(out, ctypes.c_double))
    return out


def nms_bev_sorted(boxes_sorted, thresh, post_max):
    """boxes pre-sorted by descending score → bool keep mask."""
    lib = get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes_sorted, np.float64)
    keep = np.zeros(len(b), np.int8)
    lib.tmae_nms_bev(_ptr(b, ctypes.c_double), len(b), float(thresh),
                     int(post_max), _ptr(keep, ctypes.c_int8))
    return keep.astype(bool)


def points_in_boxes(points_xyz, boxes, margin=0.0):
    """→ int32 [N] index of first containing box or -1."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(points_xyz[:, :3], np.float32)
    b = np.ascontiguousarray(boxes, np.float64)
    out = np.empty(len(p), np.int32)
    lib.tmae_points_in_boxes(_ptr(p, ctypes.c_float), len(p),
                             _ptr(b, ctypes.c_double), len(b), float(margin),
                             _ptr(out, ctypes.c_int32))
    return out


def accumulate_scores(iou, pred_scores, gt_flag, pred_flag, iou_threshold):
    lib = get_lib()
    if lib is None:
        return None
    i = np.ascontiguousarray(iou, np.float64)
    ps = np.ascontiguousarray(pred_scores, np.float64)
    gf = np.ascontiguousarray(gt_flag, np.int64)
    pf = np.ascontiguousarray(pred_flag, np.int64)
    accum = np.empty(max(i.shape[0], 1), np.float64)
    n = lib.tmae_accumulate_scores(
        _ptr(i, ctypes.c_double), i.shape[0], i.shape[1],
        _ptr(ps, ctypes.c_double), _ptr(gf, ctypes.c_int64),
        _ptr(pf, ctypes.c_int64), float(iou_threshold),
        _ptr(accum, ctypes.c_double),
    )
    return accum[:n].copy()


def compute_statistics_all(iou, pred_scores, gt_flag, pred_flag, thresholds,
                           iou_threshold):
    """→ int64 [num_thresh, 3] (tp, fp, fn) rows."""
    lib = get_lib()
    if lib is None:
        return None
    i = np.ascontiguousarray(iou, np.float64)
    ps = np.ascontiguousarray(pred_scores, np.float64)
    gf = np.ascontiguousarray(gt_flag, np.int64)
    pf = np.ascontiguousarray(pred_flag, np.int64)
    th = np.ascontiguousarray(thresholds, np.float64)
    out = np.zeros((len(th), 3), np.int64)
    lib.tmae_compute_statistics(
        _ptr(i, ctypes.c_double), i.shape[0], i.shape[1],
        _ptr(ps, ctypes.c_double), _ptr(gf, ctypes.c_int64),
        _ptr(pf, ctypes.c_int64), _ptr(th, ctypes.c_double), len(th),
        float(iou_threshold), _ptr(out, ctypes.c_int64),
    )
    return out
