"""Windowed cross-attention (WCA) between the current and previous frame.

TPU re-design of ``pcdet/models/model_utils/wca_block.py`` and the coupled two-frame
input layer ``SSTInputLayer_Temporal`` (``pcdet/models/backbones_3d/SiamWCA.py:21-
269``). Per window cell: queries = current-frame voxels, keys/values = previous-frame
voxels; windows empty in either frame contribute no update (their current voxels pass
through). Unlike the self-attention encoder, *all* current voxels go through the
FFN/LayerNorms (wca_block.py:88-103 applies them to the full list).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import windows as W
from ..ops.posembed import window_pos_embed
from ..ops.voxelize import scatter_to_grid, gather_from_grid
from .layers import SubMConvBlock
from .sst import CosineWindowAttention, VoxelSet


class WCAEncoderLayer(nn.Module):
    """Cross-attention + FFN with post-LN (reference wca_block.py:70-103)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = 'gelu'
    cosine: bool = True
    tau_min: float = 0.01

    @nn.compact
    def __call__(self, feat, pos, wp, feat_prv, pos_prv, wp_prv):
        attn = CosineWindowAttention(
            self.d_model, self.nhead, cosine=self.cosine, tau_min=self.tau_min,
        )(feat, pos, wp, feat_prv, pos_prv, wp_prv)
        # only voxels kept by the coupled partition receive the update
        # (src[keep_inds] += ..., wca_block.py:96-98); everyone is LayerNormed.
        x = nn.LayerNorm()(feat + jnp.where(wp.keep[..., None], attn, 0.0))
        from .sst import _activation
        ff = nn.Dense(self.d_model)(
            _activation(self.activation)(nn.Dense(self.dim_feedforward)(x))
        )
        return nn.LayerNorm()(x + ff)


class WCABlock(nn.Module):
    """One cross-frame stage: coupled window partition → 2 shifted WCA layers →
    residual add → SubM conv_out (reference ``WCABlock``, SiamWCA.py:272-447;
    NUM_BLOCKS is forced to 1 there, i.e. a single BasicShiftBlock_WCA of two
    shifted layers)."""

    encoder_cfg: dict
    window: int = 8
    max_tokens: int = 64

    @nn.compact
    def __call__(self, vs: VoxelSet, vs_prv: VoxelSet, train: bool) -> VoxelSet:
        ecfg = self.encoder_cfg
        d_model = ecfg['D_MODEL']
        layer_cfg = ecfg.get('LAYER_CFG', {})
        assert vs.grid_hw == vs_prv.grid_hw

        C = vs.feat.shape[-1]
        wps, wps_prv, pos, pos_prv = [], [], [], []
        for shift in (False, True):
            wp_c = W.window_partition(
                vs.coords, vs.mask, vs.grid_hw, window=self.window, shift=shift,
                max_tokens=self.max_tokens,
            )
            wp_p = W.window_partition(
                vs_prv.coords, vs_prv.mask, vs_prv.grid_hw, window=self.window,
                shift=shift, max_tokens=self.max_tokens,
            )
            wp_c, wp_p = W.couple_partitions(wp_c, wp_p)
            wps.append(wp_c)
            wps_prv.append(wp_p)
            pos.append(window_pos_embed(wp_c.pos_yx, self.window, C))
            pos_prv.append(window_pos_embed(wp_p.pos_yx, self.window, C))

        x = vs.feat
        for i in range(2):
            s = i % 2
            x = WCAEncoderLayer(
                d_model, ecfg['NHEAD'], ecfg['DIM_FEEDFORWARD'],
                activation=ecfg.get('ACTIVATION', 'gelu'),
                cosine=layer_cfg.get('cosine', True),
                tau_min=layer_cfg.get('tau_min', 0.01),
                name=f'layer_{i}',
            )(x, pos[s], wps[s], vs_prv.feat, pos_prv[s], wps_prv[s])
        x = jnp.where(vs.mask[..., None], x, 0.0)

        feat = vs.feat + x  # residual add (SiamWCA.py:438-444)
        dense = scatter_to_grid(feat, vs.coords, vs.mask, vs.grid_hw)
        occ = vs.occupancy()
        dense = SubMConvBlock(d_model, name='conv_out')(dense, occ, train)
        feat = gather_from_grid(dense, vs.coords, vs.mask)
        return VoxelSet(feat=feat, coords=vs.coords, mask=vs.mask,
                        grid_hw=vs.grid_hw)
