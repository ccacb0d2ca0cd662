"""DLA-34 image backbone with deformable-conv aggregation (reference
``pcdet/models/img_backbones/dla.py``, the GraphRCNN camera branch).

Flax/NHWC redesign: the recursive Tree/Root aggregation, DLAUp/IDAUp pyramid,
and the DCNv2 proj/node convs (via ops/dcn) are kept; the reference's
bilinear-initialized grouped transposed-conv upsampler is replaced with a
fixed bilinear ``jax.image.resize`` (documented deviation — same init-time
function, fewer parameters, and XLA lowers resize to efficient TPU code).
No ImageNet-pretrained weights are available in this environment; use
``tools/convert_torch_ckpt.py`` to import them when present.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import DeformConvBNReLU

_BN = dict(momentum=0.9, epsilon=1e-5)  # torch defaults (dla.py BN_MOMENTUM)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad,
                    kernel_dilation=self.dilation, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (dla.py:42-70)."""

    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool, residual=None):
        if residual is None:
            residual = x
        out = _ConvBNReLU(self.planes, 3, self.stride, self.dilation,
                          name='conv1')(x, train)
        out = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                      kernel_dilation=self.dilation, use_bias=False,
                      name='conv2')(out)
        out = nn.BatchNorm(use_running_average=not train, name='bn2',
                           **_BN)(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 conv over concatenated children (dla.py:73-91)."""

    features: int
    residual: bool = False

    @nn.compact
    def __call__(self, children, train: bool):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive deep-aggregation tree (dla.py:94-148)."""

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool, residual=None, children=None):
        children = [] if children is None else children
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels
        bottom = nn.max_pool(
            x, (self.stride, self.stride), strides=(self.stride, self.stride)
        ) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                               name='project_conv')(bottom)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name='project_bn', **_BN)(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = BasicBlock(self.out_channels, self.stride, name='tree1')(
                x, train, residual)
            x2 = BasicBlock(self.out_channels, 1, name='tree2')(x1, train)
            return Root(self.out_channels, self.root_residual, name='root')(
                [x2, x1, *children], train)
        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels,
                  self.stride, root_residual=self.root_residual,
                  name='tree1')(x, train, residual)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels,
                    root_dim=root_dim + self.out_channels,
                    root_residual=self.root_residual,
                    name='tree2')(x1, train, children=children)


class DLA(nn.Module):
    """DLA-34 trunk returning the 6 level maps (dla.py:150-197)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool):
        ch = self.channels
        x = _ConvBNReLU(ch[0], kernel=7, name='base_layer')(x, train)
        outs = []
        for i in range(self.levels[0]):
            x = _ConvBNReLU(ch[0], name=f'level0_{i}')(x, train)
        outs.append(x)
        for i in range(self.levels[1]):
            x = _ConvBNReLU(ch[1], stride=2 if i == 0 else 1,
                            name=f'level1_{i}')(x, train)
        outs.append(x)
        for li in range(2, 6):
            x = Tree(self.levels[li], ch[li - 1], ch[li], stride=2,
                     level_root=(li != 2), name=f'level{li}')(x, train)
            outs.append(x)
        return outs


def _resize_up(x, factor: int):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), 'bilinear')


class IDAUp(nn.Module):
    """Iterative deep aggregation over a span of levels (dla.py:240-266):
    proj (DCN) → bilinear up → node (DCN) fused with the previous level."""

    out_channels: int
    up_factors: Sequence[int]

    @nn.compact
    def __call__(self, layers, startp: int, endp: int, train: bool):
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp
            y = DeformConvBNReLU(self.out_channels, name=f'proj_{j}')(
                layers[i], train)
            y = _resize_up(y, int(self.up_factors[j]))
            layers[i] = DeformConvBNReLU(self.out_channels, name=f'node_{j}')(
                y + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Pyramid of IDAUp stages (dla.py:270-293)."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]

    @nn.compact
    def __call__(self, layers, train: bool):
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array(self.scales, int)
        in_channels = list(channels)
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUp(channels[j],
                        (scales[j:] // scales[j]).tolist(),
                        name=f'ida_{i}')
            layers[j:] = ida(layers[j:], 0, len(layers[j:]), train)
            out.insert(0, layers[-1])
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j]] * len(channels[j + 1:])
        return out


class DLASeg(nn.Module):
    """DLA-34 + DLAUp + final IDAUp → stride-``DOWN_RATIO`` feature map
    (dla.py:307-361). Config: DOWN_RATIO (2/4/8/16), LAST_LEVEL."""

    model_cfg: Any

    @nn.compact
    def __call__(self, image, train: bool):
        """image [B, H, W, 3] → features [B, H/d, W/d, channels[first]]"""
        down_ratio = int(self.model_cfg.get('DOWN_RATIO', 4))
        last_level = int(self.model_cfg.get('LAST_LEVEL', 5))
        first = int(np.log2(down_ratio))
        dla = DLA(name='base')
        channels = list(dla.channels)
        feats = dla(image, train)
        scales = [2 ** i for i in range(len(channels[first:]))]
        up = DLAUp(first, channels[first:], scales, name='dla_up')(
            feats[first:], train)
        y = list(up[:last_level - first])
        y = IDAUp(channels[first],
                  [2 ** i for i in range(last_level - first)],
                  name='ida_up')(y, 0, len(y), train)
        return y[-1]
