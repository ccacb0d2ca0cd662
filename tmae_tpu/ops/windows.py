"""Window partition / region batching for the SST sparse transformer, TPU-style.

Replaces the reference's ``SSTInputLayer`` (``pcdet/models/backbones_3d/
spt_backbone.py:11-243``), ``sst_utils.get_window_coors/get_flat2win_inds/flat2window/
window2flat`` (``pcdet/models/model_utils/sst_utils.py``) and the CUDA
``ingroup_inds`` kernel (``pcdet/ops/sst_ops/src/sst_ops_gpu.cu:14-20``).

Key design (see DESIGN.md §2): a single 64-token padded window tensor replaces the
reference's per-occupancy buckets — every reference bucket keeps all voxels up to its
range bound, so the only true semantic is "cap tokens per window at the last bucket's
max_tokens (64) and drop the excess". In-window rank is a deterministic stable sort
(the reference's is an atomicAdd race; any order is valid, ``spt_backbone.py:66-70``).

Window ids follow ``sst_utils.get_window_coors`` (``sst_utils.py:6-58``): shift0 adds a
full window, shift1 a half window; ``n_win = ceil(extent / window) + 1`` per axis.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def num_windows(grid_hw: tuple, window: int) -> tuple:
    """(nwy, nwx) per sst_utils.py:24-26 (ceil + 1 for shift headroom)."""
    H, W = grid_hw
    nwy = int(np.ceil(H / window)) + 1
    nwx = int(np.ceil(W / window)) + 1
    return nwy, nwx


@flax.struct.dataclass
class WindowPartition:
    """Static-shape window assignment for one shift of one pyramid level.

    win_slot:   [B, V] int32 — window cell id in [0, NW), NW for invalid.
    inner_rank: [B, V] int32 — deterministic rank of the voxel inside its window.
    keep:       [B, V] bool — valid & rank < max_tokens (attention participants).
    pos_yx:     [B, V, 2] float — in-window coords (y, x), for positional embedding.
    nw:         static int — number of window cells.
    max_tokens: static int.
    """

    win_slot: jnp.ndarray
    inner_rank: jnp.ndarray
    keep: jnp.ndarray
    pos_yx: jnp.ndarray
    nw: int = flax.struct.field(pytree_node=False)
    max_tokens: int = flax.struct.field(pytree_node=False)

    @property
    def dest(self):
        """Flat destination slot per voxel in the [NW * T] window buffer (OOB for
        dropped voxels)."""
        oob = self.nw * self.max_tokens
        return jnp.where(
            self.keep, self.win_slot * self.max_tokens + self.inner_rank, oob
        )


def _inner_rank(win_ids: jnp.ndarray, nw: int):
    """Deterministic in-window rank per voxel, [V]. Invalid voxels must carry
    win_id == nw. Rank = position among same-window voxels in list order."""
    V = win_ids.shape[0]
    order = jnp.argsort(win_ids)  # stable
    sids = win_ids[order]
    pos = jnp.arange(V, dtype=jnp.int32)
    newflag = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    # start position of each run, propagated by cumulative max
    starts = jax.lax.cummax(jnp.where(newflag, pos, -1))
    rank_sorted = pos - starts
    return jnp.zeros((V,), jnp.int32).at[order].set(rank_sorted)


def window_partition(coords_yx: jnp.ndarray, valid: jnp.ndarray, grid_hw: tuple,
                     window: int = 8, shift: bool = False,
                     max_tokens: int = 64) -> WindowPartition:
    """coords_yx [B, V, 2] int32, valid [B, V] → WindowPartition.

    Fast path: when ``max_tokens == window**2`` (every T-MAE config) the in-window
    slot is simply the positional index ``iy*window + ix`` — unique per pillar,
    no ranking needed, zero sorts. Only exotic max_tokens < window**2 configs pay
    for the deterministic sort-based ranking."""
    nwy, nwx = num_windows(grid_hw, window)
    nw = nwy * nwx
    off = window // 2 if shift else window
    y = coords_yx[..., 0] + off
    x = coords_yx[..., 1] + off
    wy, wx = y // window, x // window
    # window id ordering matches sst_utils.py:49-52 (x-major), z collapsed
    win = jnp.where(valid, wx * nwy + wy, nw).astype(jnp.int32)
    iy = (y % window).astype(jnp.int32)
    ix = (x % window).astype(jnp.int32)
    if max_tokens == window * window:
        rank = iy * window + ix
    else:
        rank = jax.vmap(lambda w: _inner_rank(w, nw))(win)
    keep = valid & (rank < max_tokens)
    pos_yx = jnp.stack([iy, ix], axis=-1).astype(jnp.float32)
    return WindowPartition(
        win_slot=win, inner_rank=rank, keep=keep, pos_yx=pos_yx, nw=nw,
        max_tokens=max_tokens,
    )


def couple_partitions(wp_cur: WindowPartition, wp_prv: WindowPartition):
    """Two-frame coupling for windowed cross attention, reproducing
    ``SSTInputLayer_Temporal.drop_single_shift_ref_to_prv`` (``SiamWCA.py:65-140``):
    windows empty in *either* frame are dropped from both; the shared 64-token cap
    already covers the max(count_cur, count_prv) bucket-level rule.
    Returns (wp_cur', wp_prv') with updated keep masks."""
    assert wp_cur.nw == wp_prv.nw

    def occupancy(wp):
        ones = wp.keep.astype(jnp.int32)

        def one(w, o):
            return jax.ops.segment_sum(o, w, num_segments=wp.nw + 1)[:-1]

        return jax.vmap(one)(wp.win_slot, ones)  # [B, NW]

    occ_c = occupancy(wp_cur) > 0
    occ_p = occupancy(wp_prv) > 0
    both = occ_c & occ_p  # [B, NW]

    def gate(wp):
        safe = jnp.minimum(wp.win_slot, wp.nw - 1)
        g = jnp.take_along_axis(both, safe, axis=1) & (wp.win_slot < wp.nw)
        return dataclasses.replace(wp, keep=wp.keep & g)

    return gate(wp_cur), gate(wp_prv)


def scatter_to_windows(feat: jnp.ndarray, wp: WindowPartition):
    """[B, V, C] → [B, NW, T, C] padded window tensor (zeros in empty slots)."""
    B, V, C = feat.shape
    dest = wp.dest

    def one(f, d):
        buf = jnp.zeros((wp.nw * wp.max_tokens + 1, C), f.dtype)
        return buf.at[d].set(f, mode='drop')[:-1]

    out = jax.vmap(one)(jnp.where(wp.keep[..., None], feat, 0.0), dest)
    return out.reshape(B, wp.nw, wp.max_tokens, C)


def window_key_mask(wp: WindowPartition):
    """[B, NW, T] bool — True where a real token occupies the slot."""
    B = wp.win_slot.shape[0]
    occ = scatter_to_windows(jnp.ones(wp.keep.shape + (1,), jnp.float32), wp)
    return occ[..., 0] > 0


def gather_from_windows(win_feat: jnp.ndarray, wp: WindowPartition):
    """[B, NW, T, C] → [B, V, C]; dropped voxels get zeros."""
    B, NW, T, C = win_feat.shape
    flat = win_feat.reshape(B, NW * T, C)
    safe = jnp.minimum(wp.dest, NW * T - 1)

    def one(f, d):
        return f[d]

    out = jax.vmap(one)(flat, safe)
    return jnp.where(wp.keep[..., None], out, 0.0)
