"""Sinusoidal in-window positional embedding.

Matches ``SSTInputLayer.get_pos_embed`` (``pcdet/models/backbones_3d/
spt_backbone.py:186-231``): coords are centered by half a window, frequencies are
``T ** (2*(i//2)/L)`` with sin on even and cos on odd channels, x-embed then y-embed
concatenated to feat_dim.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_pos_embed(pos_yx: jnp.ndarray, window: int, feat_dim: int,
                     temperature: float = 1000.0,
                     normalize: bool = False) -> jnp.ndarray:
    """pos_yx [..., 2] raw in-window (y, x) coords in [0, window) → [..., feat_dim]."""
    assert feat_dim % 2 == 0
    y = pos_yx[..., 0] - window / 2.0
    x = pos_yx[..., 1] - window / 2.0
    if normalize:
        x = x / window * 2 * 3.1415
        y = y / window * 2 * 3.1415
    L = feat_dim // 2
    i = jnp.arange(L, dtype=jnp.float32)
    inv_freq = temperature ** (2 * (i // 2) / L)  # [L]

    def embed(v):
        e = v[..., None] / inv_freq  # [..., L]
        sin = jnp.sin(e[..., 0::2])
        cos = jnp.cos(e[..., 1::2])
        return jnp.stack([sin, cos], axis=-1).reshape(e.shape[:-1] + (L,))

    return jnp.concatenate([embed(x), embed(y)], axis=-1)
