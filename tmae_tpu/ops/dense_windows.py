"""Dense window views: zero-copy (reshape/transpose) window partition of a dense
BEV grid.

With the positional-slot observation (DESIGN.md §2: max_tokens == window² in every
T-MAE config, so a window slot is just the in-window position), the padded window
tensor ``[B, NW, w*w, C]`` is a *pure reshape* of the (padded) dense grid — no
gather, no scatter, no sort. The shift-s partition offsets the grid by ``off``
(off = w for shift0, w/2 for shift1, matching ``sst_utils.get_window_coors``),
which becomes top-left zero padding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .posembed import window_pos_embed


def window_geometry(grid_hw, window):
    """(nwy, nwx, padded_h, padded_w) per sst_utils.py:24-26."""
    H, W = grid_hw
    nwy = int(np.ceil(H / window)) + 1
    nwx = int(np.ceil(W / window)) + 1
    return nwy, nwx, nwy * window, nwx * window


def window_view(x: jnp.ndarray, window: int, shift: bool) -> jnp.ndarray:
    """[B, H, W, C] → [B, NW, window*window, C]."""
    B, H, W, C = x.shape
    nwy, nwx, Hp, Wp = window_geometry((H, W), window)
    off = window // 2 if shift else window
    xp = jnp.pad(x, ((0, 0), (off, Hp - H - off), (off, Wp - W - off), (0, 0)))
    xw = xp.reshape(B, nwy, window, nwx, window, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(B, nwy * nwx, window * window, C)


def window_unview(xw: jnp.ndarray, grid_hw, window: int, shift: bool) -> jnp.ndarray:
    """Inverse of window_view: [B, NW, window*window, C] → [B, H, W, C]."""
    H, W = grid_hw
    B, NW, T, C = xw.shape
    nwy, nwx, Hp, Wp = window_geometry((H, W), window)
    off = window // 2 if shift else window
    x = xw.reshape(B, nwy, nwx, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, off:off + H, off:off + W, :]


def slot_pos_embed(window: int, feat_dim: int, temperature: float = 1000.0,
                   normalize: bool = False) -> jnp.ndarray:
    """Constant per-slot positional embedding [window*window, feat_dim] — the
    in-window coordinate of slot (iy, ix) is (iy, ix) itself."""
    iy, ix = np.meshgrid(np.arange(window), np.arange(window), indexing='ij')
    pos = jnp.asarray(
        np.stack([iy.reshape(-1), ix.reshape(-1)], -1).astype(np.float32)
    )
    return window_pos_embed(pos, window, feat_dim, temperature, normalize)
