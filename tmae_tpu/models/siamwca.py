"""SiamWCA: siamese two-frame SST encoder with windowed cross attention, plus the
masked-autoencoder variant for pretraining.

TPU re-design of ``pcdet/models/backbones_3d/SiamWCA.py:450-690`` and
``SiamWCA_MAE.py``. Three SST pyramid stages (strides 1, 2, 2) encode previous
and current frame with shared weights (optionally an asymmetric half-channel or
stop-gradient prev branch), a WCA block fuses each scale, and transposed-conv
deblocks merge the pyramid into a stride-1 BEV map. The pyramid runs entirely on
the dense carrier (DenseGrid) — the voxel list appears only at the VFE boundary
and in the MAE's per-voxel masking/targets.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_distance
from ..ops.voxelize import gather_from_grid, scatter_to_grid
from .layers import ConvBNReLU, DeconvBNReLU
from .sst import DenseGrid, SSTBlock, VoxelSet
from .wca import WCABlock


class PyramidFuse(nn.Module):
    """deblocks (ConvTranspose-BN-ReLU per scale) + 3x3 conv_out fusion
    (reference ``SiamWCA.dense_conv``, SiamWCA.py:597-617)."""

    fuse_layers: Sequence[dict]  # per scale: UPSAMPLE_STRIDE, NUM_UPSAMPLE_FILTER

    @nn.compact
    def __call__(self, dense_list, train: bool):
        ups = []
        for i, (cfgi, d) in enumerate(zip(self.fuse_layers, dense_list)):
            ups.append(
                DeconvBNReLU(
                    cfgi['NUM_UPSAMPLE_FILTER'], cfgi['UPSAMPLE_STRIDE'],
                    name=f'deblock_{i}',
                )(d, train)
            )
        # stride-2 grids upsample to ceil(H/2)*2 which can overshoot H by 1 cell
        H = min(u.shape[1] for u in ups)
        W_ = min(u.shape[2] for u in ups)
        ups = [u[:, :H, :W_, :] for u in ups]
        x = jnp.concatenate(ups, axis=-1)
        out_ch = x.shape[-1] // len(ups)
        return ConvBNReLU(out_ch, kernel=3, name='conv_out')(x, train)


class SiamWCAEncoder(nn.Module):
    """Shared machinery of SiamWCA / SiamWCA_MAE: pyramid encode both frames +
    cross-attend. Returns per-scale fused DenseGrids of the current frame."""

    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    remat_stages: Sequence[bool] = ()
    window: int = 8
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    occ_mid_tokens: int = 48

    def _max_tokens(self, blk) -> int:
        drop = blk['PREPROCESS']['DROP_INFO']['train']
        return max(int(v['max_tokens']) for v in dict(drop).values())

    def _cap(self, i) -> int:
        if not self.occ_window_caps:
            return 0
        return int(self.occ_window_caps[i])

    def _small_cap(self, i) -> int:
        if not self.occ_small_caps:
            return 0
        return int(self.occ_small_caps[i])

    def _mid_cap(self, i) -> int:
        if not self.occ_mid_caps:
            return 0
        return int(self.occ_mid_caps[i])

    def _remat(self, i) -> bool:
        if not self.remat_stages:
            return True
        return bool(self.remat_stages[i])

    def setup(self):
        blocks = self.model_cfg['SST_BLOCK_LIST']
        asym = self.model_cfg.get('ASYMMETRIC', None)
        self.asymmetric = bool(asym and asym.get('ENABLED', False))
        self.asym_half = bool(
            self.asymmetric and asym.get('HALF_CHANNELS', False)
        )
        self.asym_simsiam = bool(
            self.asymmetric and not self.asym_half and asym.get('SimSiam', False)
        )
        self.sst_blocks = [
            SSTBlock(
                encoder_cfg=dict(b['ENCODER']), window=self.window,
                max_tokens=self._max_tokens(b),
                max_voxels_out=self.max_voxels_per_level[i],
                remat=self._remat(i),
                occ_window_cap=self._cap(i),
                occ_small_cap=self._small_cap(i),
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_cap=self._mid_cap(i),
                occ_mid_tokens=self.occ_mid_tokens,
                name=f'sst_block_{i}',
            )
            for i, b in enumerate(blocks)
        ]
        if self.asym_half:
            self.sst_blocks_prev = [
                SSTBlock(
                    encoder_cfg=dict(b['ENCODER']), window=self.window,
                    max_tokens=self._max_tokens(b),
                    max_voxels_out=self.max_voxels_per_level[i],
                    half_channels=True,
                    remat=self._remat(i),
                    occ_window_cap=self._cap(i),
                    occ_small_cap=self._small_cap(i),
                    occ_small_tokens=self.occ_small_tokens,
                    occ_mid_cap=self._mid_cap(i),
                    occ_mid_tokens=self.occ_mid_tokens,
                    name=f'sst_block_prev_{i}',
                )
                for i, b in enumerate(blocks)
            ]
        self.wca_blocks = [
            WCABlock(
                encoder_cfg=dict(b['ENCODER']), window=self.window,
                max_tokens=self._max_tokens(b),
                occ_window_cap=self._cap(i),
                occ_small_cap=self._small_cap(i),
                occ_small_tokens=self.occ_small_tokens,
                occ_mid_cap=self._mid_cap(i),
                occ_mid_tokens=self.occ_mid_tokens,
                name=f'wca_block_{i}',
            )
            for i, b in enumerate(blocks)
        ]

    def encode_pyramid(self, grid: DenseGrid, train: bool, prev_branch: bool):
        blocks = (
            self.sst_blocks_prev if (self.asym_half and prev_branch)
            else self.sst_blocks
        )
        hidden = []
        x = grid
        for blk in blocks:
            x = blk(x, train)
            hidden.append(x)
        return hidden

    def __call__(self, grid_cur: DenseGrid, grid_prv: DenseGrid, train: bool,
                 hid_prv=None):
        """``hid_prv``: optional cached prev-frame pyramid (the previous
        streaming step's ``hid_cur``) — skips the prev encode entirely. Only
        valid with shared (non-asymmetric) weights, where the prev encoding
        IS the cur encoding of the previous step."""
        if hid_prv is not None:
            assert not self.asymmetric, (
                'streaming prev-cache requires shared-weight branches')
            hid_cur = self.encode_pyramid(grid_cur, train, prev_branch=False)
        elif self.asymmetric:
            if self.asym_simsiam:
                hid_prv = jax.tree.map(
                    jax.lax.stop_gradient,
                    self.encode_pyramid(grid_prv, train, prev_branch=False),
                )
            else:
                hid_prv = self.encode_pyramid(grid_prv, train, prev_branch=True)
            hid_cur = self.encode_pyramid(grid_cur, train, prev_branch=False)
        else:
            # shared weights: encode both frames in ONE batched pyramid pass
            # (fewer kernel launches, better utilization at small batch)
            B = grid_cur.x.shape[0]
            both = DenseGrid(
                x=jnp.concatenate([grid_cur.x, grid_prv.x], axis=0),
                occ=jnp.concatenate([grid_cur.occ, grid_prv.occ], axis=0),
            )
            hid_both = self.encode_pyramid(both, train, prev_branch=False)
            hid_cur = [DenseGrid(x=h.x[:B], occ=h.occ[:B]) for h in hid_both]
            hid_prv = [DenseGrid(x=h.x[B:], occ=h.occ[B:]) for h in hid_both]
        fused = [
            self.wca_blocks[i](hid_cur[i], hid_prv[i], train)
            for i in range(len(hid_cur))
        ]
        return fused, hid_cur


class SiamWCA(nn.Module):
    """Finetune backbone (reference ``SiamWCA``, SiamWCA.py:450-690). Produces the
    stride-1 ``spatial_features`` map [B, H, W, 128]."""

    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    occ_mid_tokens: int = 48
    remat_stages: Sequence[bool] = ()

    @nn.compact
    def __call__(self, vs_cur: VoxelSet, vs_prv: VoxelSet, train: bool,
                 cached_prev=None, return_hidden: bool = False):
        """Streaming serving: pass the previous step's ``hidden_cur`` (from
        ``return_hidden=True``) as ``cached_prev`` to skip the prev-frame
        pyramid entirely — on consecutive frames it IS the previous step's
        cur pyramid (shared-weight branches only)."""
        from .layers import CARRIER_DTYPE

        g_cur = DenseGrid(x=vs_cur.to_dense().astype(CARRIER_DTYPE),
                          occ=vs_cur.occupancy())
        if cached_prev is None:
            assert vs_prv is not None, (
                'SiamWCA needs the prev-frame voxels unless cached_prev '
                '(streaming serving) supplies the prev pyramid')
            g_prv = DenseGrid(x=vs_prv.to_dense().astype(CARRIER_DTYPE),
                              occ=vs_prv.occupancy())
        else:
            # placeholder only: SiamWCAEncoder substitutes hid_prv per stage
            g_prv = g_cur
        fused, hid_cur = SiamWCAEncoder(
            self.model_cfg, self.max_voxels_per_level,
            occ_window_caps=self.occ_window_caps,
            occ_small_caps=self.occ_small_caps,
            occ_small_tokens=self.occ_small_tokens,
            occ_mid_caps=self.occ_mid_caps,
            occ_mid_tokens=self.occ_mid_tokens,
            remat_stages=self.remat_stages, name='encoder'
        )(g_cur, g_prv, train, hid_prv=cached_prev)
        fuse_layers = [
            dict(self.model_cfg['FUSE_LAYER'][src])
            for src in self.model_cfg['FEATURES_SOURCE']
        ]
        spatial = PyramidFuse(fuse_layers, name='fuse')(
            [f.x for f in fused], train
        )
        if return_hidden:
            return spatial, fused, hid_cur
        return spatial, fused


def random_voxel_mask(rng, voxel_mask: jnp.ndarray, num_voxels: jnp.ndarray,
                      mask_ratio: float):
    """Per-sample random masking over valid voxels. Returns mae_mask [B, V] float
    (1 = masked/removed, 0 = keep), matching ``common_utils.random_masking``
    (common_utils.py:49-63): len_keep = int(L * (1 - ratio)) per sample."""
    B, V = voxel_mask.shape
    noise = jax.random.uniform(rng, (B, V))
    noise = jnp.where(voxel_mask, noise, 2.0)  # invalid last
    order = jnp.argsort(noise, axis=1)
    ranks = jax.vmap(
        lambda o: jnp.zeros((V,), jnp.int32).at[o].set(jnp.arange(V, dtype=jnp.int32))
    )(order)
    len_keep = (num_voxels.astype(jnp.float32) * (1.0 - mask_ratio)).astype(jnp.int32)
    keep = ranks < len_keep[:, None]
    mae_mask = jnp.where(voxel_mask, 1.0 - keep.astype(jnp.float32), 0.0)
    return mae_mask


def gather_gt_points(points_xyz, point_voxel, point_valid, V: int, K: int):
    """First-K points of each voxel, wrap-repeated to fill K (reference CUDA
    ``group_inner_inds``, sst_ops_gpu.cu:22-39; in-voxel order here is the
    deterministic list order). Returns [B, V, K, 3]."""
    B, P, _ = points_xyz.shape
    pv = jnp.where(point_valid, point_voxel, V)

    def rank_one(pvb):
        order = jnp.argsort(pvb)
        s = pvb[order]
        pos = jnp.arange(P, dtype=jnp.int32)
        newflag = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        starts = jax.lax.cummax(jnp.where(newflag, pos, -1))
        r = pos - starts
        return jnp.zeros((P,), jnp.int32).at[order].set(r)

    rank = jax.vmap(rank_one)(pv)  # [B, P]
    dest = jnp.where((rank < K) & (pv < V), pv * K + rank, V * K)

    def scat(xyz, d):
        return jnp.zeros((V * K + 1, 3), xyz.dtype).at[d].set(xyz, mode='drop')[:-1]

    buf = jax.vmap(scat)(points_xyz, dest).reshape(B, V, K, 3)
    # per-voxel point count (≤ K)
    cnt = jax.vmap(
        lambda d: jnp.zeros((V * K + 1,), jnp.int32).at[d].add(1, mode='drop')[:-1]
    )(dest).reshape(B, V, K).sum(-1)
    n = jnp.clip(cnt, 1, K)  # [B, V]
    idx = jnp.arange(K)[None, None, :] % n[..., None]  # wrap-repeat
    return jnp.take_along_axis(buf, idx[..., None].astype(jnp.int32), axis=2)


class SiamWCA_MAE(nn.Module):
    """Pretrain backbone (reference ``SiamWCA_MAE``): full prev encode, 75%-masked
    current encode, WCA fusion, dense decoder, per-voxel point-cloud prediction.

    Returns dict with pred/gt point clouds and per-voxel loss weights."""

    model_cfg: Any
    max_voxels_per_level: Sequence[int]
    voxel_size: tuple
    pc_range: tuple
    occ_window_caps: Sequence[int] | None = None
    occ_small_caps: Sequence[int] | None = None
    occ_small_tokens: int = 16
    occ_mid_caps: Sequence[int] | None = None
    occ_mid_tokens: int = 48
    remat_stages: Sequence[bool] = ()

    @nn.compact
    def __call__(self, vs_cur: VoxelSet, vs_prv: VoxelSet,
                 points_xyz, point_voxel, point_valid,
                 train: bool, mask_rng=None):
        mask_cfg = self.model_cfg['MASK_CONFIG']
        ratio = float(mask_cfg['RATIO'])
        n_pred = int(mask_cfg['NUM_PRD_POINTS'])
        n_gt = int(mask_cfg['NUM_GT_POINTS'])

        num_valid = jnp.sum(vs_cur.mask, axis=1)
        if mask_rng is None:
            mask_rng = self.make_rng('mae_mask')
        mae_mask = random_voxel_mask(mask_rng, vs_cur.mask, num_valid, ratio)
        visible = vs_cur.mask & (mae_mask == 0.0)
        vs_vis = VoxelSet(
            feat=jnp.where(visible[..., None], vs_cur.feat, 0.0),
            coords=vs_cur.coords, mask=visible, grid_hw=vs_cur.grid_hw,
        )
        from .layers import CARRIER_DTYPE

        g_vis = DenseGrid(x=vs_vis.to_dense().astype(CARRIER_DTYPE),
                          occ=vs_vis.occupancy())
        g_prv = DenseGrid(x=vs_prv.to_dense().astype(CARRIER_DTYPE),
                          occ=vs_prv.occupancy())

        fused = SiamWCAEncoder(
            self.model_cfg, self.max_voxels_per_level,
            occ_window_caps=self.occ_window_caps,
            occ_small_caps=self.occ_small_caps,
            occ_small_tokens=self.occ_small_tokens,
            occ_mid_caps=self.occ_mid_caps,
            occ_mid_tokens=self.occ_mid_tokens,
            remat_stages=self.remat_stages, name='encoder'
        )(g_vis, g_prv, train)[0]
        fuse_layers = [
            dict(self.model_cfg['FUSE_LAYER'][src])
            for src in self.model_cfg['FEATURES_SOURCE']
        ]
        spatial = PyramidFuse(fuse_layers, name='decoder_fuse')(
            [f.x for f in fused], train
        )

        # pyramid features for ALL voxels (visible + masked), SiamWCA_MAE.py:303-319
        V = vs_cur.coords.shape[1]
        pyr = gather_from_grid(spatial, vs_cur.coords, vs_cur.mask)  # [B, V, C]
        pred = nn.Dense(n_pred * 3, name='decoder_pred')(pyr)
        pred = pred.reshape(pred.shape[0], V, n_pred, 3)

        gt = gather_gt_points(points_xyz, point_voxel, point_valid, V, n_gt)
        vsz = jnp.asarray(self.voxel_size, jnp.float32)
        rng_ = jnp.asarray(self.pc_range, jnp.float32)
        cx = (vs_cur.coords[..., 1].astype(jnp.float32) + 0.5) * vsz[0] + rng_[0]
        cy = (vs_cur.coords[..., 0].astype(jnp.float32) + 0.5) * vsz[1] + rng_[1]
        cz = jnp.full_like(cx, 0.5 * vsz[2] + rng_[2])
        centers = jnp.stack([cx, cy, cz], axis=-1)  # [B, V, 3]
        norm_gt = gt - centers[:, :, None, :]

        weights = mae_mask * vs_cur.mask.astype(jnp.float32)
        return {
            'pred_points': pred,
            'gt_points': norm_gt,
            'loss_weights': weights,
            'mae_mask': mae_mask,
            'spatial_features': spatial,
        }

    @staticmethod
    def loss(out) -> jnp.ndarray:
        """Chamfer over masked voxels only (SiamWCA_MAE.py:154-164)."""
        B, V = out['loss_weights'].shape
        pred = out['pred_points'].reshape(B * V, -1, 3)
        gt = out['gt_points'].reshape(B * V, -1, 3)
        w = out['loss_weights'].reshape(B * V)
        return chamfer_distance(pred, gt, weights=w)
