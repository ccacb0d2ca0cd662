"""Import the reference's pure-torch modules from /root/reference as parity
oracles, stubbing its CUDA bindings and spconv with deterministic pure-torch
equivalents.

The reference's CUDA ``ingroup_inds`` is intentionally racy (any in-group order
is valid, spt_backbone.py:66-70); the stub picks array order, which both sides
then share.
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

REF = Path('/root/reference')


def _pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__path__ = [str(path)]
    sys.modules[name] = m
    return m


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference():
    """Set up the pcdet package namespace over /root/reference with stubs.
    Returns the pcdet module root; safe to call repeatedly."""
    import torch

    if 'pcdet.models.model_utils.sst_utils' in sys.modules:
        return sys.modules['pcdet']

    _pkg('pcdet', REF / 'pcdet')
    _pkg('pcdet.models', REF / 'pcdet/models')
    _pkg('pcdet.models.model_utils', REF / 'pcdet/models/model_utils')
    _pkg('pcdet.models.backbones_3d', REF / 'pcdet/models/backbones_3d')
    _pkg('pcdet.models.dense_heads', REF / 'pcdet/models/dense_heads')
    _pkg('pcdet.ops', REF / 'pcdet/ops')
    _pkg('pcdet.ops.sst_ops', REF / 'pcdet/ops/sst_ops')
    _pkg('pcdet.utils', REF / 'pcdet/utils')

    def ingroup_inds_wrapper(group_inds, out_inds):
        g = group_inds
        n = g.numel()
        order = torch.argsort(g, stable=True)
        sg = g[order]
        pos = torch.arange(n, device=g.device)
        new = torch.ones(n, dtype=torch.bool, device=g.device)
        if n > 1:
            new[1:] = sg[1:] != sg[:-1]
        starts = torch.cummax(torch.where(new, pos, torch.zeros_like(pos)),
                              0).values
        out_inds[order] = pos - starts

    def group_inner_inds_wrapper(inverse_inds, group_inds):
        K = group_inds.shape[1]
        V = group_inds.shape[0]
        inv = inverse_inds
        for v in range(V):  # test-scale only
            idx = torch.nonzero(inv == v).flatten()
            if len(idx) == 0:
                continue
            take = idx[:K]
            group_inds[v] = take[torch.arange(K) % len(take)]

    _stub('pcdet.ops.sst_ops.sst_ops_cuda',
          ingroup_inds_wrapper=ingroup_inds_wrapper,
          group_inner_inds_wrapper=group_inner_inds_wrapper)

    # spconv placeholders: SSTInputLayer / the window blocks never touch them
    # real (pure-torch, semantically exact) spconv + torch_scatter shims so
    # the reference's FULL detector graph can run as a parity oracle; the
    # reference's own pcdet.utils.spconv_utils then imports for real
    import ref_spconv_shim as shim

    import torch.nn as _nn

    spconv_mod = _stub(
        'spconv',
        SparseConvTensor=shim.SparseConvTensor,
        SubMConv2d=shim.SubMConv2d,
        SparseConv2d=shim.SparseConv2d,
        SparseSequential=shim.SparseSequential,
        SparseModule=_nn.Module,
    )
    sys.modules['spconv.pytorch'] = spconv_mod
    spconv_mod.pytorch = spconv_mod
    _stub('torch_scatter', scatter=shim.scatter, scatter_max=shim.scatter_max,
          scatter_min=shim.scatter_min)

    def _no_cuda(*a, **k):
        raise RuntimeError('CUDA op not available in parity tests')

    _stub('pcdet.ops.iou3d_nms', )
    _stub('pcdet.ops.iou3d_nms.iou3d_nms_utils',
          nms_gpu=_no_cuda, nms_normal_gpu=_no_cuda,
          boxes_iou3d_gpu=_no_cuda, boxes_iou_bev=_no_cuda,
          boxes_bev_iou_cpu=_no_cuda, boxes_overlap_bev_gpu=_no_cuda)
    _stub('pcdet.ops.roiaware_pool3d', )
    _stub('pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils',
          points_in_boxes_cpu=_no_cuda, points_in_boxes_gpu=_no_cuda)

    # numba (not installed here): passthrough decorators — the jitted
    # reference functions are plain python loops, fine at test scale
    def _jit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(f):
            return f

        return deco

    _stub('numba', jit=_jit, njit=_jit, prange=range)
    _stub('SharedArray', attach=_no_cuda, create=_no_cuda, delete=_no_cuda)
    # the reference hardcodes .cuda() in a few __init__s
    # (center_head.py:68); make it a no-op in this CPU-only oracle env
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    return sys.modules['pcdet']


class CfgDict(dict):
    """Attribute-access dict standing in for EasyDict model_cfgs."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict) and not isinstance(v, CfgDict):
            v = CfgDict(v)
        return v


def ref_module(name):
    load_reference()
    return importlib.import_module(name)
