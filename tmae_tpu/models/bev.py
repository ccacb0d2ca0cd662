"""2D BEV backbones.

``SSTBEVBackbone``: reference ``pcdet/models/backbones_2d/sst_bev_backbone.py`` —
a stack of 3x3 Conv-BN-ReLU blocks (one dilated) with shortcut adds.
``BaseBEVBackbone``: reference ``backbones_2d/base_bev_backbone.py`` — multiscale
conv blocks + transposed-conv fusion (used by SECOND/PointPillar shells).
All maps are NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNReLU, DeconvBNReLU


class SSTBEVBackbone(nn.Module):
    """4x Conv-BN-ReLU with shortcuts on the configured layers
    (sst_bev_backbone.py:14-41; cfg t_mae.yaml:197-206)."""

    model_cfg: Any

    @nn.compact
    def __call__(self, x, train: bool):
        conv_kwargs = self.model_cfg['CONV_KWARGS']
        shortcut_at = set(self.model_cfg.get('CONV_SHORTCUT', []))
        num_filter = self.model_cfg.get('NUM_FILTER', x.shape[-1])
        if x.shape[-1] != num_filter:
            x = ConvBNReLU(num_filter, kernel=1, padding=0, name='conv_in')(x, train)
        for i, kw in enumerate(conv_kwargs):
            y = ConvBNReLU(
                kw['out_channels'], kernel=kw['kernel_size'],
                stride=kw.get('stride', 1), dilation=kw.get('dilation', 1),
                padding=kw.get('padding', None), name=f'conv_{i}',
            )(x, train)
            x = x + y if i in shortcut_at else y
        return x


class BaseBEVBackbone(nn.Module):
    """Standard OpenPCDet BEV net: per-level strided conv stacks, upsampled and
    concatenated (base_bev_backbone.py)."""

    model_cfg: Any

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.model_cfg
        layer_nums = cfg.get('LAYER_NUMS', [])
        strides = cfg.get('LAYER_STRIDES', [1] * len(layer_nums))
        filters = cfg.get('NUM_FILTERS', [])
        up_strides = cfg.get('UPSAMPLE_STRIDES', [])
        up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])
        ups = []
        for i, n in enumerate(layer_nums):
            x = ConvBNReLU(filters[i], kernel=3, stride=strides[i],
                           name=f'block{i}_in')(x, train)
            for j in range(n):
                x = ConvBNReLU(filters[i], kernel=3, name=f'block{i}_{j}')(x, train)
            if i < len(up_strides):
                s = up_strides[i]
                if s >= 1:
                    ups.append(
                        DeconvBNReLU(up_filters[i], int(s), name=f'up{i}')(x, train)
                    )
                else:
                    ups.append(
                        ConvBNReLU(up_filters[i], kernel=int(round(1 / s)),
                                   stride=int(round(1 / s)), padding=0,
                                   name=f'down{i}')(x, train)
                    )
        if len(ups) > 1:
            x = jnp.concatenate(ups, axis=-1)
        elif ups:
            x = ups[0]
        return x


class HeightCompression(nn.Module):
    """map_to_bev: flatten z into channels (reference map_to_bev/height_compression
    .py). Input [B, Z, H, W, C] NHWC-with-depth → [B, H, W, Z*C]."""

    @nn.compact
    def __call__(self, x):
        B, Z, H, W, C = x.shape
        return x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, Z * C)
