"""Pure-torch stand-ins for spconv 2.x and torch_scatter, semantically exact at
fixture scale, so the reference's FULL detector graph (TemporalDynVFE → SiamWCA
→ SSTBEVBackbone → CenterHead) can run as a parity oracle.

Exactness argument: ``SparseConvTensor.dense()`` zero-fills inactive sites, so
a dense conv over it equals spconv's gather-based convolution at every active
output site. SubMConv2d keeps the input active set; SparseConv2d's active set
is "any active input inside the kernel footprint" (max-pool of the occupancy),
matching spconv's output-index rule. Weights are stored in the spconv 2.x
layout [out, kh, kw, in] so converted state_dicts look like real checkpoints
to ``tmae_tpu.utils.torch_convert``.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features            # [N, C]
        self.indices = indices              # [N, 1+ndim] int (b, y, x) for 2d
        self.spatial_shape = list(spatial_shape)
        self.batch_size = int(batch_size)

    def dense(self):
        C = self.features.shape[1]
        H, W = self.spatial_shape
        out = torch.zeros(self.batch_size, C, H, W,
                          dtype=self.features.dtype,
                          device=self.features.device)
        b = self.indices[:, 0].long()
        y = self.indices[:, 1].long()
        x = self.indices[:, 2].long()
        out[b, :, y, x] = self.features
        return out

    def replace_feature(self, f):
        return SparseConvTensor(f, self.indices, self.spatial_shape,
                                self.batch_size)


def replace_feature(sp, f):
    return sp.replace_feature(f)


def _gather(dense, indices):
    b = indices[:, 0].long()
    y = indices[:, 1].long()
    x = indices[:, 2].long()
    return dense[b, :, y, x]


class SubMConv2d(nn.Module):
    """Submanifold conv: active set unchanged; weight layout [O, K, K, I]."""

    def __init__(self, in_channels, out_channels, kernel_size, bias=False,
                 indice_key=None, stride=1, padding=None):
        super().__init__()
        k = kernel_size
        self.weight = nn.Parameter(
            torch.randn(out_channels, k, k, in_channels) * 0.02)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        self.k = k

    def forward(self, sp):
        o = F.conv2d(sp.dense(), self.weight.permute(0, 3, 1, 2), self.bias,
                     stride=1, padding=self.k // 2)
        return sp.replace_feature(_gather(o, sp.indices))


class SparseConv2d(nn.Module):
    """Strided sparse conv: output active where any input is active in the
    kernel footprint."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=False, indice_key=None):
        super().__init__()
        k = kernel_size
        self.weight = nn.Parameter(
            torch.randn(out_channels, k, k, in_channels) * 0.02)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        self.k, self.stride, self.padding = k, stride, padding

    def forward(self, sp):
        d = sp.dense()
        o = F.conv2d(d, self.weight.permute(0, 3, 1, 2), self.bias,
                     stride=self.stride, padding=self.padding)
        occ = torch.zeros(sp.batch_size, 1, *sp.spatial_shape,
                          device=d.device)
        b = sp.indices[:, 0].long()
        occ[b, 0, sp.indices[:, 1].long(), sp.indices[:, 2].long()] = 1.0
        occ_out = F.max_pool2d(occ, self.k, self.stride, self.padding)
        nb, _, ny, nx = torch.nonzero(occ_out > 0, as_tuple=False).T
        idx = torch.stack([nb, ny, nx], dim=1).int()
        return SparseConvTensor(_gather(o, idx), idx,
                                list(o.shape[2:]), sp.batch_size)


class SparseSequential(nn.Sequential):
    """Applies sparse-conv members to the tensor, dense members (norm/act) to
    .features — spconv.SparseSequential behavior."""

    def forward(self, sp):
        for m in self:
            if isinstance(m, (SubMConv2d, SparseConv2d, SparseSequential)):
                sp = m(sp)
            else:
                sp = sp.replace_feature(m(sp.features))
        return sp


# --- torch_scatter ---------------------------------------------------------

def _expand_index(index, src):
    if src.dim() == 1:
        return index
    return index[:, None].expand_as(src)


def scatter(src, index, dim=0, reduce='mean', dim_size=None):
    assert dim == 0
    n = int(index.max().item()) + 1 if dim_size is None else dim_size
    shape = (n,) + tuple(src.shape[1:])
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    cnt = torch.zeros(n, dtype=src.dtype, device=src.device)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    if reduce == 'mean':
        out = out / cnt.clamp(min=1).reshape((n,) + (1,) * (src.dim() - 1))
    elif reduce != 'sum':
        raise NotImplementedError(reduce)
    return out


def _scatter_extreme(src, index, op):
    n = int(index.max().item()) + 1
    shape = (n,) + tuple(src.shape[1:])
    fill = float('-inf') if op == 'amax' else float('inf')
    out = torch.full(shape, fill, dtype=src.dtype, device=src.device)
    out.scatter_reduce_(0, _expand_index(index, src), src, reduce=op,
                        include_self=True)
    # argmax/argmin: first position matching the extreme
    pos = torch.arange(len(index), device=src.device)
    match = src == out.index_select(0, index)
    big = torch.full_like(pos, len(index))
    argshape = (n,) + tuple(src.shape[1:])
    arg = torch.full(argshape, len(index), dtype=torch.long,
                     device=src.device)
    posx = pos if src.dim() == 1 else pos[:, None].expand_as(src)
    cand = torch.where(match, posx, big.reshape((-1,) + (1,) * (src.dim() - 1)))
    arg.scatter_reduce_(0, _expand_index(index, src), cand, reduce='amin',
                       include_self=True)
    return out, arg


def scatter_max(src, index, dim=0):
    assert dim == 0
    return _scatter_extreme(src, index, 'amax')


def scatter_min(src, index, dim=0):
    assert dim == 0
    return _scatter_extreme(src, index, 'amin')
