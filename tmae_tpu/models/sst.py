"""SST sparse-transformer encoder: cosine window attention, shifted-window encoder
layers, and the SSTBlock (conv_down → window encoder → residual → SubM conv_out).

TPU re-design of ``pcdet/models/model_utils/{sst_basic_block,cosine_msa}.py`` and
``pcdet/models/backbones_3d/spt_backbone.py:267-353``. Tokens live in a compact
``[B, V, C]`` list; attention runs over a single 64-token padded window tensor
(DESIGN.md §2) with key-padding masks. Projections/FFN/LN operate on the compact
list (no padded-slot waste).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops import windows as W
from ..ops.posembed import window_pos_embed
from ..ops.voxelize import (
    scatter_to_grid, gather_from_grid, occupancy_grid, downsample_coords,
)
from .layers import (
    MaskedBatchNorm, SubMConvBlock, StridedSparseConvBlock,
)


@flax.struct.dataclass
class VoxelSet:
    """Sparse BEV tensor: compact voxel list + grid shape (TPU analog of
    spconv.SparseConvTensor)."""

    feat: jnp.ndarray  # [B, V, C]
    coords: jnp.ndarray  # [B, V, 2] int32 (y, x)
    mask: jnp.ndarray  # [B, V] bool
    grid_hw: tuple = flax.struct.field(pytree_node=False)

    def to_dense(self):
        return scatter_to_grid(self.feat, self.coords, self.mask, self.grid_hw)

    def occupancy(self):
        return occupancy_grid(self.coords, self.mask, self.grid_hw)


class CosineWindowAttention(nn.Module):
    """Multi-head window attention with cosine similarity / learnable temperature
    (reference ``CosineMultiheadAttention``, cosine_msa.py:114-176,441-528).

    Queries/keys/values are provided as flat token lists with window partitions;
    cross-attention is expressed by passing a different kv list/partition.
    """

    d_model: int
    nhead: int
    cosine: bool = True
    tau_min: float = 0.01

    @nn.compact
    def __call__(self, q_feat, q_pos, wp_q, kv_feat, kv_pos, wp_kv):
        C, H = self.d_model, self.nhead
        D = C // H
        q = nn.Dense(C, name='q_proj')(q_feat + q_pos)
        k = nn.Dense(C, name='k_proj')(kv_feat + kv_pos)
        v = nn.Dense(C, name='v_proj')(kv_feat)

        qw = W.scatter_to_windows(q, wp_q)  # [B, NW, T, C]
        kw = W.scatter_to_windows(k, wp_kv)
        vw = W.scatter_to_windows(v, wp_kv)
        kmask = W.window_key_mask(wp_kv)  # [B, NW, Tk]

        B, NW, T, _ = qw.shape
        Tk = kw.shape[2]
        qh = qw.reshape(B, NW, T, H, D)
        kh = kw.reshape(B, NW, Tk, H, D)
        vh = vw.reshape(B, NW, Tk, H, D)

        if self.cosine:
            tau = self.param('tau', nn.initializers.ones, (1,))
            qh = qh / jnp.maximum(
                jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12
            )
            kh = kh / jnp.maximum(
                jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12
            )
            logits = jnp.einsum('bwqhd,bwkhd->bwhqk', qh, kh)
            logits = logits / jnp.maximum(tau, self.tau_min)
        else:
            logits = jnp.einsum('bwqhd,bwkhd->bwhqk', qh, kh) / jnp.sqrt(D)

        neg = jnp.asarray(-1e9, logits.dtype)
        logits = jnp.where(kmask[:, :, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        # fully-masked rows (empty windows / padded queries) → zero output
        any_key = jnp.any(kmask, axis=-1)[:, :, None, None, None]
        attn = jnp.where(any_key, attn, 0.0)
        out = jnp.einsum('bwhqk,bwkhd->bwqhd', attn, vh).reshape(B, NW, T, C)
        out = W.gather_from_windows(out, wp_q)
        return nn.Dense(C, name='out_proj')(out)


def _activation(name):
    """Exact (non-approximate) GELU to match torch F.gelu for checkpoint parity."""
    if name == 'gelu':
        return lambda x: nn.gelu(x, approximate=False)
    return getattr(nn, name)


class EncoderLayer(nn.Module):
    """Window self-attention + FFN with post-LN residuals (reference
    ``EncoderLayer``, sst_basic_block.py:57-84). Dropout is 0 in all T-MAE configs."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = 'gelu'
    cosine: bool = True
    tau_min: float = 0.01

    @nn.compact
    def __call__(self, feat, pos, wp):
        attn = CosineWindowAttention(
            self.d_model, self.nhead, cosine=self.cosine, tau_min=self.tau_min,
        )(feat, pos, wp, feat, pos, wp)
        x = nn.LayerNorm()(feat + attn)
        ff = nn.Dense(self.d_model)(
            _activation(self.activation)(nn.Dense(self.dim_feedforward)(x))
        )
        return nn.LayerNorm()(x + ff)


class BasicShiftBlock(nn.Module):
    """Two encoder layers alternating shift0/shift1 (reference
    ``BasicShiftBlockV2``, sst_basic_block.py:87-114)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = 'gelu'
    cosine: bool = True
    tau_min: float = 0.01

    @nn.compact
    def __call__(self, feat, pos_list, wp_list):
        for i in range(2):
            feat = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                activation=self.activation, cosine=self.cosine,
                tau_min=self.tau_min,
            )(feat, pos_list[i % len(wp_list)], wp_list[i % len(wp_list)])
        return feat


def make_partitions(vs: VoxelSet, window: int, max_tokens: int):
    """Both shifted partitions + positional embeddings for a voxel set.

    Note: an 8x8 window holds at most 64 distinct pillars, so with max_tokens=64
    (every T-MAE config) no voxel is ever dropped and a single pass suffices. For
    max_tokens < 64 the reference removes voxels dropped in *either* shift before
    ranking (spt_backbone.py:73-135), so we run a second pass restricted to the
    survivors of both shifts."""

    def partition(valid):
        wps = []
        for shift in (False, True):
            wps.append(
                W.window_partition(
                    vs.coords, valid, vs.grid_hw, window=window, shift=shift,
                    max_tokens=max_tokens,
                )
            )
        return wps

    wp_list = partition(vs.mask)
    if max_tokens < window * window:
        survivors = vs.mask & wp_list[0].keep & wp_list[1].keep
        wp_list = partition(survivors)
    pos_list = [
        window_pos_embed(wp.pos_yx, window, vs.feat.shape[-1]) for wp in wp_list
    ]
    return wp_list, pos_list


class SSTBlock(nn.Module):
    """One pyramid stage: optional strided conv_down, NUM_BLOCKS shifted-window
    encoder blocks, residual add, SubM conv_out (reference ``SSTBlockV1``,
    spt_backbone.py:267-353).

    The reference's drop semantics are preserved: voxels beyond 64 per window skip
    the encoder entirely (identity passthrough into the residual)."""

    encoder_cfg: dict  # NUM_BLOCKS, STRIDE, D_MODEL, NHEAD, DIM_FEEDFORWARD, ...
    window: int = 8
    max_tokens: int = 64
    max_voxels_out: int = 0  # voxel cap after downsampling (0: same as input)
    half_channels: bool = False  # asymmetric siamese branch (spt_backbone.py:274-287)

    @nn.compact
    def __call__(self, vs: VoxelSet, train: bool) -> VoxelSet:
        ecfg = self.encoder_cfg
        d_model_out = ecfg['D_MODEL']
        d_model = d_model_out // 2 if self.half_channels else d_model_out
        dim_ff = ecfg['DIM_FEEDFORWARD'] // (2 if self.half_channels else 1)
        stride = ecfg.get('STRIDE', 1)
        layer_cfg = ecfg.get('LAYER_CFG', {})

        if stride > 1:
            H, W_ = vs.grid_hw
            new_hw = ((H + 1) // 2, (W_ + 1) // 2)
            vout = self.max_voxels_out or vs.feat.shape[1]
            new_coords, new_mask = downsample_coords(
                vs.coords, vs.mask, vs.grid_hw, vout
            )
            occ_out = occupancy_grid(new_coords, new_mask, new_hw)
            dense = vs.to_dense()
            dense = StridedSparseConvBlock(d_model, name='conv_down')(
                dense, occ_out, train
            )
            feat = gather_from_grid(dense, new_coords, new_mask)
            vs = VoxelSet(feat=feat, coords=new_coords, mask=new_mask,
                          grid_hw=new_hw)
        elif self.half_channels:
            # 1x1 'spconv' projection to the halved width (spt_backbone.py:284-287)
            dense = vs.to_dense()
            occ = vs.occupancy()
            x = nn.Conv(d_model, (1, 1), use_bias=False, name='conv_down_1x1')(dense)
            x = jnp.where(occ[..., None], x, 0.0)
            x = MaskedBatchNorm(name='conv_down_bn')(
                x, occ, use_running_average=not train
            )
            feat = gather_from_grid(nn.relu(x), vs.coords, vs.mask)
            vs = VoxelSet(feat=feat, coords=vs.coords, mask=vs.mask,
                          grid_hw=vs.grid_hw)

        wp_list, pos_list = make_partitions(vs, self.window, self.max_tokens)
        # encoder operates on voxels kept in both shifts; dropped voxels pass
        # through untouched (residual semantics, spt_backbone.py:342-353)
        kept_both = wp_list[0].keep & wp_list[1].keep
        x = vs.feat
        for i in range(ecfg['NUM_BLOCKS']):
            x = BasicShiftBlock(
                d_model, ecfg['NHEAD'], dim_ff,
                activation=ecfg.get('ACTIVATION', 'gelu'),
                cosine=layer_cfg.get('cosine', True),
                tau_min=layer_cfg.get('tau_min', 0.01),
                name=f'encoder_{i}',
            )(x, pos_list, wp_list)
        x = jnp.where((vs.mask & kept_both)[..., None], x, 0.0)

        # residual add (spt_backbone.py:349-351) then SubM conv_out
        feat = vs.feat + x
        dense = scatter_to_grid(feat, vs.coords, vs.mask, vs.grid_hw)
        occ = vs.occupancy()
        dense = SubMConvBlock(d_model_out, name='conv_out')(dense, occ, train)
        feat = gather_from_grid(dense, vs.coords, vs.mask)
        return VoxelSet(feat=feat, coords=vs.coords, mask=vs.mask,
                        grid_hw=vs.grid_hw)
