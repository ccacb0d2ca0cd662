"""SST sparse-transformer encoder: cosine window attention, shifted-window
encoder layers, and the SSTBlock (conv_down → window encoder → residual → SubM
conv_out).

TPU re-design of ``pcdet/models/model_utils/{sst_basic_block,cosine_msa}.py`` and
``pcdet/models/backbones_3d/spt_backbone.py:267-353``.

Two execution paths:

* **Dense path (default, hot)** — valid whenever ``max_tokens == window**2``
  (every T-MAE config; an 8x8 window cannot hold more than 64 pillars, see
  DESIGN.md §2). The BEV state is a dense ``[B, H, W, C]`` grid + occupancy;
  window partition is a *pure reshape* (``ops/dense_windows.py``), the positional
  embedding is a constant per slot, and the whole block is reshapes + matmuls +
  convs — zero gathers/scatters/sorts, bf16 matmul precision. Measured ~4x faster
  than the list path on TPU.

* **List path** — compact ``[B, V, C]`` voxel lists with sort-ranked window slots
  (``ops/windows.py``), kept for exotic ``max_tokens < window**2`` configs and as
  a semantics cross-check in tests.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops import windows as W
from ..ops.dense_windows import slot_pos_embed, window_unview, window_view
from ..ops.posembed import window_pos_embed
from ..ops.voxelize import (
    scatter_to_grid, gather_from_grid, occupancy_grid, downsample_coords,
)
from .layers import (
    MaskedBatchNorm, SubMConvBlock, StridedSparseConvBlock,
)

COMPUTE_DTYPE = jnp.bfloat16

# Debug escape hatch: disable the combined-bucket serving path (one gather +
# in-place row kernels + one scatter per layer). Read ONCE at import so a
# process cannot silently trace two divergent graphs depending on when the
# env var was set (ADVICE r3).
import os as _os  # noqa: E402

_NO_COMBINED = bool(_os.environ.get('TMAE_NO_COMBINED'))
# Round-5 fused DMA+layer+DMA serving kernels are OPT-IN: measured e2e they
# match the combined-bucket path (22.4 vs 22.6 fps, same day) but compile
# 2-3x slower (~250-370 s vs ~115 s for the bucketed serving graph), which
# busts the driver bench's 480 s cold budget. TMAE_FUSED_INPLACE=1 enables
# them; the combined gather/rows/scatter path is the default.
_FUSED_INPLACE = bool(_os.environ.get('TMAE_FUSED_INPLACE'))
_NO_FUSED_INPLACE = not _FUSED_INPLACE or bool(
    _os.environ.get('TMAE_NO_FUSED_INPLACE'))


@flax.struct.dataclass
class VoxelSet:
    """Sparse BEV tensor: compact voxel list + grid shape (TPU analog of
    spconv.SparseConvTensor). Interface type between the VFE and the backbones."""

    feat: jnp.ndarray  # [B, V, C]
    coords: jnp.ndarray  # [B, V, 2] int32 (y, x)
    mask: jnp.ndarray  # [B, V] bool
    grid_hw: tuple = flax.struct.field(pytree_node=False)

    def to_dense(self):
        return scatter_to_grid(self.feat, self.coords, self.mask, self.grid_hw)

    def occupancy(self):
        return occupancy_grid(self.coords, self.mask, self.grid_hw)


@flax.struct.dataclass
class DenseGrid:
    """Dense BEV activation + occupancy (the hot-path carrier)."""

    x: jnp.ndarray  # [B, H, W, C]
    occ: jnp.ndarray  # [B, H, W] bool

    @property
    def grid_hw(self):
        return (self.x.shape[1], self.x.shape[2])


def occ_downsample(occ: jnp.ndarray) -> jnp.ndarray:
    """spconv SparseConv2d(k=3, s=2, p=1) active-output set == 3x3/s2/p1 max-pool
    of the occupancy (DESIGN.md §3)."""
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or, (1, 3, 3), (1, 2, 2),
        ((0, 0), (1, 1), (1, 1)),
    )


def _activation(name):
    """Exact (non-approximate) GELU to match torch F.gelu for checkpoint parity."""
    if name == 'gelu':
        return lambda x: nn.gelu(x, approximate=False)
    return getattr(nn, name)


# ---------------------------------------------------------------------------
# Dense path
# ---------------------------------------------------------------------------

class DenseWindowAttention(nn.Module):
    """Cosine multi-head attention over dense window views (reference
    ``CosineMultiheadAttention``, cosine_msa.py:114-176,441-528). Cross-attention
    = different kv grid (the WCA case).

    Two equivalent executions over one parameter set: the fused Pallas kernel
    (``ops/pallas_attn.py``, default on TPU) and a jnp reference path (CPU /
    fallback). Self-attention fuses the q/k projections into one matmul."""

    d_model: int
    nhead: int
    window: int
    shift: bool
    cosine: bool = True
    tau_min: float = 0.01
    use_pallas: bool | None = None  # None = auto (TPU only)

    @nn.compact
    def __call__(self, grid: DenseGrid, kv_grid: DenseGrid | None = None):
        from ..ops import pallas_attn

        assert self.cosine, (
            'DenseWindowAttention implements the cosine variant used by every '
            'T-MAE config; plain dot-product attention lives in the list path'
        )
        C, w = self.d_model, self.window
        cross = kv_grid is not None
        dt = COMPUTE_DTYPE
        kinit = nn.initializers.lecun_normal()
        zinit = nn.initializers.zeros

        xw = window_view(grid.x.astype(dt), w, self.shift)  # [B, NW, T, C]
        kvw = (
            xw if not cross
            else window_view(kv_grid.x.astype(dt), w, self.shift)
        )
        src_occ = (kv_grid if cross else grid).occ
        kmask = window_view(
            src_occ[..., None].astype(jnp.float32), w, self.shift
        )[..., 0]
        pos = slot_pos_embed(w, C).astype(dt)  # [T, C] constant

        if cross:
            wq = self.param('q_kernel', kinit, (C, C))
            bq = self.param('q_bias', zinit, (C,))
            wk = self.param('k_kernel', kinit, (C, C))
            bk = self.param('k_bias', zinit, (C,))
        else:
            wqk = self.param('qk_kernel', kinit, (C, 2 * C))
            bqk = self.param('qk_bias', zinit, (2 * C,))
            wq, wk = wqk[:, :C], wqk[:, C:]
            bq, bk = bqk[:C], bqk[C:]
        wv = self.param('v_kernel', kinit, (C, C))
        bv = self.param('v_bias', zinit, (C,))
        wo = self.param('out_kernel', kinit, (C, C))
        bo = self.param('out_bias', zinit, (C,))
        tau = self.param('tau', nn.initializers.ones, (1,))

        B, NW, T, _ = xw.shape
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() not in ('cpu',)
                and self.cosine and C % 128 == 0 and T % 8 == 0
            )
        flat = lambda a: a.reshape(B * NW, *a.shape[2:])
        if use_pallas:
            out = pallas_attn.fused_window_attention(
                flat(xw), flat(kvw), flat(kmask), pos,
                wq, bq, wk, bk, wv, bv, wo, bo, tau,
                self.nhead, self.tau_min, cross,
            )
        else:
            out = pallas_attn._reference_forward(
                flat(xw), flat(kvw), flat(kmask), pos,
                wq, bq, wk, bk, wv, bv, wo, bo, tau,
                self.nhead, self.tau_min, cross,
            )
        out = out.reshape(B, NW, T, C)
        out = window_unview(out, grid.grid_hw, w, self.shift)
        return jnp.where(grid.occ[..., None], out, 0.0).astype(jnp.float32)


class DenseEncoderLayer(nn.Module):
    """Window attention + FFN with post-LN residuals on the dense grid
    (reference ``EncoderLayer``, sst_basic_block.py:57-84; WCA variant
    wca_block.py:70-103). On TPU the whole layer runs as ONE fused Pallas kernel
    (``ops/pallas_encoder.py``) — one HBM read/write of the window tensor instead
    of ~8 full-grid passes; on CPU/fallback the identical jnp reference runs."""

    d_model: int
    nhead: int
    dim_feedforward: int
    window: int
    shift: bool
    activation: str = 'gelu'
    cosine: bool = True
    tau_min: float = 0.01
    cross: bool = False
    use_pallas: bool | None = None
    # serving=True (inference) enables the combined-bucket execution: one
    # gather + in-place row kernels + one scatter per layer instead of a
    # gather/kernel/scatter triple per bucket (forward-only Pallas path)
    serving: bool = False

    @nn.compact
    def __call__(self, grid: DenseGrid, kv_grid: DenseGrid | None = None,
                 compact=None, carriers=None):
        """``carriers``: optional (xp, kvp) grids ALREADY padded for this
        layer's shift (DenseShiftBlock keeps the carrier padded across its
        two layers, converting geometry with one lax.pad). When given, the
        return value is the updated padded xp instead of a DenseGrid."""
        from ..ops import pallas_encoder

        assert self.cosine and self.activation == 'gelu', (
            'the fused dense encoder implements the cosine+gelu variant used by '
            'every T-MAE config; others live in the list path'
        )
        C, w, F = self.d_model, self.window, self.dim_feedforward
        cross = self.cross and kv_grid is not None
        dt = COMPUTE_DTYPE
        kinit = nn.initializers.lecun_normal()
        zinit = nn.initializers.zeros

        if cross:
            wq = self.param('q_kernel', kinit, (C, C))
            bq = self.param('q_bias', zinit, (C,))
            wk = self.param('k_kernel', kinit, (C, C))
            bk = self.param('k_bias', zinit, (C,))
        else:
            wqk = self.param('qk_kernel', kinit, (C, 2 * C))
            bqk = self.param('qk_bias', zinit, (2 * C,))
            wq, wk = wqk[:, :C], wqk[:, C:]
            bq, bk = bqk[:C], bqk[C:]
        wv = self.param('v_kernel', kinit, (C, C))
        bv = self.param('v_bias', zinit, (C,))
        wo = self.param('out_kernel', kinit, (C, C))
        bo = self.param('out_bias', zinit, (C,))
        tau = self.param('tau', nn.initializers.ones, (1,))
        ln1s = self.param('ln1_scale', nn.initializers.ones, (C,))
        ln1b = self.param('ln1_bias', zinit, (C,))
        f1w = self.param('ffn1_kernel', kinit, (C, F))
        f1b = self.param('ffn1_bias', zinit, (F,))
        f2w = self.param('ffn2_kernel', kinit, (F, C))
        f2b = self.param('ffn2_bias', zinit, (C,))
        ln2s = self.param('ln2_scale', nn.initializers.ones, (C,))
        ln2b = self.param('ln2_bias', zinit, (C,))

        pos = slot_pos_embed(w, C).astype(dt)
        T = w * w
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() not in ('cpu',)
                and C % 128 == 0 and T % 8 == 0
            )
        params = (wq, bq, wk, bk, wv, bv, wo, bo, tau,
                  ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b)
        if compact is not None:
            # occupied-window compaction (ops/occ_compact.py): gather only the
            # occupied windows, run the flat fused kernel(s) on them, and
            # scatter-OVERWRITE the results into the input grid. Unvisited
            # windows (occupied beyond a cap, or simply empty) keep the input
            # content — the identity degradation of the residual reference
            # block (spt_backbone.py:342-353) — and the writeback moves only
            # cap window blocks: no memsets, adds, or occ-mask full passes.
            # Invariant: unoccupied cells stay zero (kernels mask their output
            # per qmask; unvisited windows inherit the already-masked input).
            from ..ops.occ_compact import (
                BucketedCompact, gather_windows_padded, pad_grid,
                scatter_windows_into_padded, unpad_grid,
            )

            hw = grid.grid_hw
            kvg = kv_grid if cross else grid
            B = grid.x.shape[0]
            flatn = lambda a: a.reshape(-1, *a.shape[2:])
            # pad ONCE per (layer, shift) — or reuse the caller's padded
            # carriers; gather/scatter run against the padded array and the
            # scatter aliases it in place
            if carriers is not None:
                xp, kvp = carriers
            else:
                xp = pad_grid(grid.x.astype(dt), w, self.shift)
                kvp = (pad_grid(kvg.x.astype(dt), w, self.shift)
                       if cross else None)

            def run_full(ci, xp):
                cap = ci.idx.shape[1]
                xw = gather_windows_padded(xp, ci.idx, w)
                kvw = (gather_windows_padded(kvp, ci.idx, w)
                       if cross else xw)
                qm = ci.qmask
                km = ci.kmask if cross else qm
                fn = (pallas_encoder.fused_encoder_layer if use_pallas
                      else pallas_encoder.reference_encoder_layer)
                out = fn(
                    flatn(xw), flatn(kvw), flatn(qm), flatn(km), pos, *params,
                    nhead=self.nhead, tau_min=self.tau_min, cross=cross,
                )
                out = out.reshape(B, cap, T, C)
                return scatter_windows_into_padded(out, ci.idx, xp, w)

            def run_small(si, xp):
                # token-bucketed kernel: layer math at S = si.sel.shape[-1]
                # tokens; its output is xw + the expanded delta, i.e. the full
                # window content to write back (fused_encoder_layer_sel
                # dispatches to the jnp reference off-TPU)
                cap = si.idx.shape[1]
                xw = gather_windows_padded(xp, si.idx, w)
                kvw = (gather_windows_padded(kvp, si.idx, w)
                       if cross else xw)
                sel_k = si.ksel if cross else si.sel
                km = si.kmask if cross else si.qmask
                out = pallas_encoder.fused_encoder_layer_sel(
                    flatn(xw), flatn(kvw), flatn(si.sel), flatn(sel_k),
                    flatn(si.qmask), flatn(km), pos, *params,
                    self.nhead, self.tau_min, cross,
                )
                out = out.reshape(B, cap, T, C)
                return scatter_windows_into_padded(out, si.idx, xp, w)

            def run_fused_inplace(bc, xp):
                # round-5 serving path: one pallas_call per bucket fuses
                # DMA-in + layer + DMA-out directly against the padded
                # carrier — no intermediate window tensor, 3 launches/layer,
                # with chunk j+1's fetch and j-1's writeback overlapping
                # chunk j's compute (double-buffered pipelined kernel;
                # 2.07 -> 1.18 ms/layer at stage-1 caps B=2 with 32-wide
                # tiles, tools/profile_fused_layer.py). Buckets touch
                # disjoint window sets, so order is free.
                fn = pallas_encoder.encoder_layer_fused_pipelined
                for si in (bc.small, bc.mid):
                    if si is None or not si.idx.shape[1]:
                        continue
                    xp = fn(xp, kvp, si, pos, *params, nhead=self.nhead,
                            tau_min=self.tau_min, cross=cross, window=w,
                            sel=True)
                ci = bc.full
                if ci is not None and ci.idx.shape[1]:
                    xp = fn(xp, kvp, ci, pos, *params, nhead=self.nhead,
                            tau_min=self.tau_min, cross=cross, window=w,
                            sel=False)
                return xp

            def run_train_cat(bc, xp):
                # training (round 5): ONE differentiable gather over the
                # concatenated plan, per-bucket kernels on ROW SLICES (the
                # custom_vjp fused kernels), one concat, ONE differentiable
                # scatter — 5 launches/layer fwd (and ~5 bwd) instead of the
                # 9 (12 cross) of per-bucket gather/kernel/scatter triples.
                xw_all = gather_windows_padded(xp, bc.cat_idx, w)
                kv_all = (gather_windows_padded(kvp, bc.cat_idx, w)
                          if cross else None)
                lo = 0
                outs = []
                for si in (bc.small, bc.mid):
                    if si is None or not si.idx.shape[1]:
                        continue
                    cap = si.idx.shape[1]
                    xw = jax.lax.slice_in_dim(xw_all, lo, lo + cap, axis=1)
                    kvw = (jax.lax.slice_in_dim(kv_all, lo, lo + cap, axis=1)
                           if cross else xw)
                    out = pallas_encoder.fused_encoder_layer_sel(
                        flatn(xw), flatn(kvw), flatn(si.sel),
                        flatn(si.ksel if cross else si.sel),
                        flatn(si.qmask),
                        flatn(si.kmask if cross else si.qmask),
                        pos, *params, self.nhead, self.tau_min, cross,
                    )
                    outs.append(out.reshape(B, cap, T, C))
                    lo += cap
                ci = bc.full
                if ci is not None and ci.idx.shape[1]:
                    cap = ci.idx.shape[1]
                    xw = jax.lax.slice_in_dim(xw_all, lo, lo + cap, axis=1)
                    kvw = (jax.lax.slice_in_dim(kv_all, lo, lo + cap, axis=1)
                           if cross else xw)
                    fn = (pallas_encoder.fused_encoder_layer if use_pallas
                          else pallas_encoder.reference_encoder_layer)
                    out = fn(
                        flatn(xw), flatn(kvw), flatn(ci.qmask),
                        flatn(ci.kmask if cross else ci.qmask), pos, *params,
                        nhead=self.nhead, tau_min=self.tau_min, cross=cross,
                    )
                    outs.append(out.reshape(B, cap, T, C))
                out_all = (outs[0] if len(outs) == 1
                           else jnp.concatenate(outs, axis=1))
                return scatter_windows_into_padded(
                    out_all.astype(xp.dtype), bc.cat_idx, xp, w)

            def run_combined(bc, xp):
                # serving: ONE gather over the concatenated plan, per-bucket
                # in-place row kernels, ONE scatter (see pallas_encoder.py
                # combined-bucket section). Forward-only Pallas.
                xw_all = gather_windows_padded(xp, bc.cat_idx, w)
                kv_all = (gather_windows_padded(kvp, bc.cat_idx, w)
                          if cross else None)
                lo = 0
                for si in (bc.small, bc.mid):
                    if si is None or not si.idx.shape[1]:
                        continue
                    xw_all = pallas_encoder.encoder_layer_rows_sel(
                        xw_all, kv_all, si.sel,
                        si.ksel if cross else si.sel, si.qmask,
                        si.kmask if cross else si.qmask, pos, *params,
                        nhead=self.nhead, tau_min=self.tau_min, cross=cross,
                        row_lo=lo,
                    )
                    lo += si.idx.shape[1]
                ci = bc.full
                if ci is not None and ci.idx.shape[1]:
                    xw_all = pallas_encoder.encoder_layer_rows_full(
                        xw_all, kv_all, ci.qmask,
                        ci.kmask if cross else ci.qmask, pos, *params,
                        nhead=self.nhead, tau_min=self.tau_min, cross=cross,
                        row_lo=lo,
                    )
                return scatter_windows_into_padded(xw_all, bc.cat_idx, xp, w)

            if isinstance(compact, BucketedCompact):
                # NB: run_combined is FORWARD-ONLY (no custom_vjp; aliased
                # pallas_call). Differentiating an eval-mode apply (feature
                # attribution, distillation) must set TMAE_NO_COMBINED=1 or
                # use train=True — otherwise Pallas raises a transpose error.
                if (self.serving and use_pallas and not _NO_COMBINED
                        and compact.cat_idx is not None):
                    # interpret mode keeps the BlockSpec-based combined path
                    # (manual-DMA kernels are excluded there, like the multi
                    # gather/scatter in occ_compact)
                    if _NO_FUSED_INPLACE or pallas_encoder._INTERPRET:
                        xp = run_combined(compact, xp)
                    else:
                        xp = run_fused_inplace(compact, xp)
                elif compact.cat_idx is not None:
                    xp = run_train_cat(compact, xp)
                else:
                    if (compact.full is not None
                            and compact.full.idx.shape[1]):
                        xp = run_full(compact.full, xp)
                    if compact.mid is not None and compact.mid.idx.shape[1]:
                        xp = run_small(compact.mid, xp)
                    if (compact.small is not None
                            and compact.small.idx.shape[1]):
                        xp = run_small(compact.small, xp)
            else:
                xp = run_full(compact, xp)
            if carriers is not None:
                return xp
            x = unpad_grid(xp, hw, w, self.shift)
            return DenseGrid(x=x, occ=grid.occ)
        if use_pallas:
            # grid-native kernel: window partition + layer + inverse partition
            # inside one pallas_call — the HBM window_view/unview transposes
            # cost ~4 ms each at 468² and the C=1 occupancy view another ~4 ms
            kvg = kv_grid if cross else grid
            x = pallas_encoder.fused_encoder_layer_grid(
                grid.x.astype(dt), kvg.x.astype(dt), grid.occ, kvg.occ, pos,
                *params, self.nhead, self.tau_min, cross, w, self.shift,
            )
            x = jnp.where(grid.occ[..., None], x, jnp.zeros((), x.dtype))
            return DenseGrid(x=x, occ=grid.occ)

        xw = window_view(grid.x.astype(dt), w, self.shift)
        kvw = (
            window_view(kv_grid.x.astype(dt), w, self.shift) if cross else xw
        )
        qmask = window_view(
            grid.occ[..., None].astype(jnp.float32), w, self.shift
        )[..., 0]
        kmask = (
            window_view(
                kv_grid.occ[..., None].astype(jnp.float32), w, self.shift
            )[..., 0] if cross else qmask
        )
        B, NW, T, _ = xw.shape
        flat = lambda a: a.reshape(B * NW, *a.shape[2:])
        out = pallas_encoder.reference_encoder_layer(
            flat(xw), flat(kvw), flat(qmask), flat(kmask), pos, *params,
            nhead=self.nhead, tau_min=self.tau_min, cross=cross,
        )
        out = out.reshape(B, NW, T, C)
        x = window_unview(out, grid.grid_hw, w, self.shift)
        x = jnp.where(grid.occ[..., None], x, jnp.zeros((), x.dtype))
        return DenseGrid(x=x, occ=grid.occ)


class DenseShiftBlock(nn.Module):
    """Two encoder layers alternating shift0/shift1 (``BasicShiftBlockV2``,
    sst_basic_block.py:87-114)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    window: int
    activation: str = 'gelu'
    cosine: bool = True
    tau_min: float = 0.01
    cross: bool = False
    # carrier_io: the caller owns the padded carrier — __call__ receives
    # ``xp_in`` (shift0 geometry) and returns the updated padded carrier
    # (shift1 geometry) instead of a DenseGrid, so a multi-block stage pays
    # ONE pad and ONE unpad total (SSTBlock hoists it)
    carrier_io: bool = False
    serving: bool = False

    @nn.compact
    def __call__(self, grid: DenseGrid, kv_grid: DenseGrid | None = None,
                 compact_pair=None, xp_in=None):
        layers = [
            DenseEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.window,
                shift=(i % 2 == 1), activation=self.activation,
                cosine=self.cosine, tau_min=self.tau_min, cross=self.cross,
                serving=self.serving,
                name=f'EncoderLayer_{i}',
            )
            for i in range(2)
        ]
        if compact_pair is not None:
            # keep the carrier PADDED across both layers; the shift-geometry
            # conversion between them is one fused crop+pad (repad_grid)
            from ..ops.occ_compact import pad_grid, repad_grid, unpad_grid

            w = self.window
            dt = COMPUTE_DTYPE
            cross = self.cross and kv_grid is not None
            xp = (xp_in if xp_in is not None
                  else pad_grid(grid.x.astype(dt), w, False))
            kvp0 = (pad_grid(kv_grid.x.astype(dt), w, False)
                    if cross else None)
            kvp = kvp0
            for i in range(2):
                shift = i % 2 == 1
                if i:
                    xp = repad_grid(xp, w, False, True)
                    kvp = (repad_grid(kvp0, w, False, True)
                           if cross else None)
                xp = layers[i](grid, kv_grid, compact_pair[i % 2],
                               carriers=(xp, kvp))
            if self.carrier_io:
                return xp
            x = unpad_grid(xp, grid.grid_hw, w, True)
            return DenseGrid(x=x, occ=grid.occ)
        for i in range(2):
            grid = layers[i](grid, kv_grid)
        return grid


class SSTBlock(nn.Module):
    """One pyramid stage on the dense carrier: optional strided conv_down,
    NUM_BLOCKS shifted-window encoder blocks, residual add, SubM conv_out
    (reference ``SSTBlockV1``, spt_backbone.py:267-353)."""

    encoder_cfg: dict  # NUM_BLOCKS, STRIDE, D_MODEL, NHEAD, DIM_FEEDFORWARD, ...
    window: int = 8
    max_tokens: int = 64
    max_voxels_out: int = 0  # unused on the dense path (kept for config parity)
    half_channels: bool = False  # asymmetric siamese branch (spt_backbone.py:274-287)
    remat: bool = True
    occ_window_cap: int = 0  # >0: occupied-window compaction with this cap
    occ_small_cap: int = 0   # >0: token-bucketed small-window plan (cap)
    occ_small_tokens: int = 16  # small-bucket token count S
    occ_mid_cap: int = 0     # >0: second packed bucket (cap)
    occ_mid_tokens: int = 48

    @nn.compact
    def __call__(self, grid: DenseGrid, train: bool) -> DenseGrid:
        ecfg = self.encoder_cfg
        d_model_out = ecfg['D_MODEL']
        d_model = d_model_out // 2 if self.half_channels else d_model_out
        dim_ff = ecfg['DIM_FEEDFORWARD'] // (2 if self.half_channels else 1)
        stride = ecfg.get('STRIDE', 1)
        layer_cfg = ecfg.get('LAYER_CFG', {})
        if self.max_tokens != self.window * self.window:
            raise NotImplementedError(
                'dense SST path requires max_tokens == window**2 (all T-MAE '
                'configs); the list-based ops in ops/windows.py cover smaller '
                'caps'
            )

        x, occ = grid.x, grid.occ
        conv_remat = (nn.remat(StridedSparseConvBlock, static_argnums=(3,))
                      if self.remat else StridedSparseConvBlock)
        subm_remat = (nn.remat(SubMConvBlock, static_argnums=(3,))
                      if self.remat else SubMConvBlock)
        if stride > 1:
            occ_out = occ_downsample(occ)
            x = conv_remat(d_model, name='conv_down')(
                x, occ_out, train
            )
            occ = occ_out
        elif self.half_channels:
            x = nn.Conv(d_model, (1, 1), use_bias=False, name='conv_down_1x1')(x)
            x = jnp.where(occ[..., None], x, 0.0)
            x = MaskedBatchNorm(name='conv_down_bn')(
                x, occ, use_running_average=not train
            )
            x = nn.relu(x)

        g = DenseGrid(x=x, occ=occ)
        # one compaction plan per shift, shared by every layer of the stage
        compact_pair = None
        conv_plan = None
        if self.occ_window_cap > 0:
            from ..ops.occ_compact import (
                build_bucketed_compact_info, build_compact_info,
                gather_window_occ, occupied_window_indices, round_cap,
            )

            hw = (x.shape[1], x.shape[2])
            # occupancy-aware conv_out (ops/sparse_conv.py) is EXPERIMENTAL:
            # measured slower than XLA's native conv at high window counts
            # (sublane-shifted tap slices relayout in Mosaic), so the plan
            # stays disabled until the kernel wins
            conv_plan = None
            if self.occ_small_cap > 0:
                compact_pair = tuple(
                    build_bucketed_compact_info(
                        occ, self.window, s, self.occ_small_cap,
                        self.occ_window_cap, hw,
                        small_tokens=self.occ_small_tokens,
                        mid_cap=self.occ_mid_cap,
                        mid_tokens=self.occ_mid_tokens)
                    for s in (False, True)
                )
            else:
                compact_pair = tuple(
                    build_compact_info(occ, self.window, s,
                                       round_cap(self.occ_window_cap), hw)
                    for s in (False, True)
                )
            # observability: occupied windows dropped by the cap (these run as
            # identity). Captured via apply(..., mutable=['intermediates']).
            self.sow('intermediates', 'occ_overflow',
                     compact_pair[0].overflow() + compact_pair[1].overflow())
        # remat each shift block: the window tensors dominate training memory
        # (jax.checkpoint trades recompute for HBM, DESIGN.md §6)
        block_cls = nn.remat(DenseShiftBlock) if self.remat else DenseShiftBlock
        if compact_pair is not None:
            # stage-level padded carrier: ONE pad + ONE unpad for the whole
            # stage; between blocks a single fused crop+pad converts the
            # shift1 end geometry back to shift0
            from ..ops.occ_compact import pad_grid, repad_grid, unpad_grid

            xp = pad_grid(g.x.astype(COMPUTE_DTYPE), self.window, False)
            for i in range(ecfg['NUM_BLOCKS']):
                if i:
                    xp = repad_grid(xp, self.window, True, False)
                xp = block_cls(
                    d_model, ecfg['NHEAD'], dim_ff, self.window,
                    activation=ecfg.get('ACTIVATION', 'gelu'),
                    cosine=layer_cfg.get('cosine', True),
                    tau_min=layer_cfg.get('tau_min', 0.01),
                    carrier_io=True, serving=not train,
                    name=f'encoder_{i}',
                )(g, None, compact_pair, xp)
            g = DenseGrid(
                x=unpad_grid(xp, g.grid_hw, self.window, True), occ=g.occ)
        else:
            for i in range(ecfg['NUM_BLOCKS']):
                g = block_cls(
                    d_model, ecfg['NHEAD'], dim_ff, self.window,
                    activation=ecfg.get('ACTIVATION', 'gelu'),
                    cosine=layer_cfg.get('cosine', True),
                    tau_min=layer_cfg.get('tau_min', 0.01),
                    name=f'encoder_{i}',
                )(g, None, compact_pair)

        # residual add (spt_backbone.py:349-351) then SubM conv_out
        y = x + g.x
        y = subm_remat(d_model_out, name='conv_out')(y, occ, train, conv_plan)
        return DenseGrid(x=y, occ=occ)


# ---------------------------------------------------------------------------
# List path (exotic max_tokens configs + cross-checks); see module docstring.
# ---------------------------------------------------------------------------

class CosineWindowAttention(nn.Module):
    """List-path cosine window attention over ``[B, V, C]`` token lists with
    precomputed WindowPartitions (used by tests / max_tokens < window**2)."""

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
        any_key = jnp.any(kmask, axis=-1)[:, :, None, None, None]
        attn = jnp.where(any_key, attn, 0.0)
        out = jnp.einsum('bwhqk,bwkhd->bwqhd', attn, vh).reshape(B, NW, T, C)
        out = W.gather_from_windows(out, wp_q)
        return nn.Dense(C, name='out_proj')(out)


class EncoderLayer(nn.Module):
    """List-path window self-attention + FFN (sst_basic_block.py:57-84)."""

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
    """List-path two encoder layers alternating shifts."""

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
    """List-path: both shifted partitions + positional embeddings.

    For max_tokens < window**2 the reference removes voxels dropped in *either*
    shift before ranking (spt_backbone.py:73-135), hence the second pass."""

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
