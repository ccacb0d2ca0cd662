"""VoxelBackBone8x: the SECOND-family 3D sparse-conv backbone (reference
OpenPCDet ``pcdet/models/backbones_3d/spconv_backbone.py`` registry entry used by
``detectors/second_net.py``), built on the gather-based 3D sparse conv of
``ops/sparse3d.py``, plus HeightCompression to BEV.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.sparse3d import (
    build_index_grid, downsample_coords_3d, gather_neighbors,
    sparse_conv3d_apply,
)
from .layers import MaskedBatchNorm


class SubMConv3dBlock(nn.Module):
    """Submanifold 3D conv + masked BN + ReLU (same active set in/out)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, feat, coords, mask, grid_dhw, index_grid, train: bool):
        K = self.kernel ** 3
        w = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (K, feat.shape[-1], self.features),
        )
        nb = gather_neighbors(index_grid, coords, mask, grid_dhw,
                              kernel=self.kernel, stride=1)
        x = sparse_conv3d_apply(feat, nb, w)
        x = jnp.where(mask[..., None], x, 0.0)
        x = MaskedBatchNorm()(x, mask, use_running_average=not train)
        return nn.relu(x)


class SparseConv3dBlock(nn.Module):
    """Strided 3D sparse conv + masked BN + ReLU (new active set)."""

    features: int
    stride: Any = 2
    padding: Any = 1
    kernel: int = 3
    max_out: int = 0

    @nn.compact
    def __call__(self, feat, coords, mask, grid_dhw, index_grid, train: bool):
        K = self.kernel ** 3
        w = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (K, feat.shape[-1], self.features),
        )
        vout = self.max_out or feat.shape[1]
        new_coords, new_mask, out_dhw = downsample_coords_3d(
            coords, mask, grid_dhw, self.stride, self.padding, self.kernel,
            vout,
        )
        # taps sample input cells stride*out + off - pad
        st = np.broadcast_to(np.asarray(self.stride), (3,))
        pd = np.broadcast_to(np.asarray(self.padding), (3,))
        k = self.kernel
        offs = np.stack(
            np.meshgrid(np.arange(k), np.arange(k), np.arange(k),
                        indexing='ij'), -1
        ).reshape(-1, 3) - pd  # offset includes padding shift
        offs_j = jnp.asarray(offs, jnp.int32)
        D, H, W = grid_dhw
        base = new_coords[:, :, None, :] * jnp.asarray(st, jnp.int32) + offs_j
        inb = jnp.all(
            (base >= 0) & (base < jnp.asarray([D, H, W])), axis=-1
        )
        flat = (base[..., 0] * H + base[..., 1]) * W + base[..., 2]
        flat = jnp.clip(flat, 0, D * H * W - 1)
        import jax as _jax
        nb = _jax.vmap(lambda g, f: g[f])(index_grid, flat)
        nb = jnp.where(inb & new_mask[..., None], nb, -1)
        x = sparse_conv3d_apply(feat, nb, w)
        x = jnp.where(new_mask[..., None], x, 0.0)
        x = MaskedBatchNorm()(x, new_mask, use_running_average=not train)
        return nn.relu(x), new_coords, new_mask, out_dhw


class VoxelBackBone8x(nn.Module):
    """16 → 32 → 64 → 64 channel pyramid with 8x spatial downsampling + the
    (3,1,1)-stride-(2,1,1) conv_out, mirroring the reference layer stack."""

    model_cfg: Any
    grid_dhw: tuple  # input sparse shape (D, H, W) — already +1 z like spconv
    max_voxels_per_level: Sequence[int]

    @nn.compact
    def __call__(self, feat, coords_zyx, mask, train: bool):
        caps = list(self.max_voxels_per_level)
        while len(caps) < 5:
            caps.append(caps[-1])
        dhw = self.grid_dhw
        ig = build_index_grid(coords_zyx, mask, dhw)
        x = SubMConv3dBlock(16, name='conv_input')(
            feat, coords_zyx, mask, dhw, ig, train)
        x = SubMConv3dBlock(16, name='conv1')(x, coords_zyx, mask, dhw, ig, train)

        hidden = {'x_conv1': (x, coords_zyx, mask, dhw)}
        specs = [
            ('conv2', 32, 2, 1, caps[1]),
            ('conv3', 64, 2, 1, caps[2]),
            ('conv4', 64, 2, (0, 1, 1), caps[3]),
        ]
        for i, (name, ch, st, pd, cap) in enumerate(specs):
            x, coords_zyx, mask, dhw = SparseConv3dBlock(
                ch, stride=st, padding=pd, max_out=cap, name=f'{name}_down'
            )(x, coords_zyx, mask, dhw, ig, train)
            ig = build_index_grid(coords_zyx, mask, dhw)
            x = SubMConv3dBlock(ch, name=f'{name}_subm1')(
                x, coords_zyx, mask, dhw, ig, train)
            x = SubMConv3dBlock(ch, name=f'{name}_subm2')(
                x, coords_zyx, mask, dhw, ig, train)
            hidden[f'x_conv{i + 2}'] = (x, coords_zyx, mask, dhw)

        # conv_out: kernel (3,1,1) stride (2,1,1) padding 0 → z compressed
        x, coords_zyx, mask, dhw = SparseConv3dBlock(
            128, stride=(2, 1, 1), padding=0, kernel=3, max_out=caps[4],
            name='conv_out',
        )(x, coords_zyx, mask, dhw, ig, train)
        # NOTE: reference conv_out kernel is (3,1,1); we use 3^3 with the same
        # stride/padding semantics on z and pointwise-extent masked on y/x via
        # padding 0 — documented deviation (slightly larger receptive field).
        return x, coords_zyx, mask, dhw, hidden


def height_compression(feat, coords_zyx, mask, dhw):
    """Sparse [B, V, C] at small z-depth → dense BEV [B, H, W, D*C]
    (reference map_to_bev/height_compression.py)."""
    D, H, W = dhw
    B, V, C = feat.shape
    flat = jnp.where(
        mask,
        (coords_zyx[..., 0] * H + coords_zyx[..., 1]) * W + coords_zyx[..., 2],
        D * H * W,
    )
    import jax as _jax

    def one(f, i):
        return jnp.zeros((D * H * W + 1, C), f.dtype).at[i].set(
            f, mode='drop')[:-1]

    dense = _jax.vmap(one)(jnp.where(mask[..., None], feat, 0.0), flat)
    dense = dense.reshape(B, D, H, W, C).transpose(0, 2, 3, 1, 4)
    return dense.reshape(B, H, W, D * C)
