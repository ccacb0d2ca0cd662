"""Static-shape 3D sparse convolution via neighbor gathering.

TPU replacement for spconv's 3D SubMConv3d / SparseConv3d (the reference's
SECOND-family backbone ``VoxelBackBone8x``). Unlike the 2D BEV case (dense conv
wins, DESIGN.md §3), 3D grids (~41 x 1500 x 1500) are far too large to
densify — instead each active voxel gathers its k³ neighbors through a dense
int32 *index* grid (4 bytes/cell, built by one scatter) and contracts
``[V, k³·Cin] x [k³·Cin, Cout]`` on the MXU.

Voxel sets: feat [B, V, C], coords [B, V, 3] (z, y, x), mask [B, V].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .voxelize import _grid_compact


def build_index_grid(coords_zyx: jnp.ndarray, mask: jnp.ndarray,
                     grid_dhw: tuple) -> jnp.ndarray:
    """[B, V] voxel slots scattered into a dense [B, D*H*W] int32 grid (-1 =
    empty)."""
    D, H, W = grid_dhw
    n = D * H * W
    ids = jnp.where(
        mask,
        (coords_zyx[..., 0] * H + coords_zyx[..., 1]) * W + coords_zyx[..., 2],
        n,
    )
    V = coords_zyx.shape[1]
    slots = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None], ids.shape
    )

    def one(i, s):
        return jnp.full((n + 1,), -1, jnp.int32).at[i].set(s, mode='drop')[:-1]

    return jax.vmap(one)(ids, slots)


def gather_neighbors(index_grid: jnp.ndarray, coords_zyx: jnp.ndarray,
                     mask: jnp.ndarray, grid_dhw: tuple, kernel: int = 3,
                     stride: int = 1):
    """For each output voxel, the input-slot index of each kernel tap
    ([B, V, k^3], -1 where absent). With stride>1, ``coords_zyx`` are OUTPUT
    coords and taps sample input cells ``stride*out + offset - pad``."""
    D, H, W = grid_dhw
    k = kernel
    pad = k // 2
    offs = np.stack(np.meshgrid(np.arange(k), np.arange(k), np.arange(k),
                                indexing='ij'), -1).reshape(-1, 3) - pad
    offs = jnp.asarray(offs, jnp.int32)  # [k^3, 3]
    base = coords_zyx[:, :, None, :] * stride + offs[None, None]
    inb = jnp.all((base >= 0) & (base < jnp.asarray([D, H, W])), axis=-1)
    flat = (base[..., 0] * H + base[..., 1]) * W + base[..., 2]
    flat = jnp.clip(flat, 0, D * H * W - 1)

    def one(g, f):
        return g[f]

    nb = jax.vmap(one)(index_grid, flat)  # [B, V, k^3]
    nb = jnp.where(inb & mask[..., None], nb, -1)
    return nb


def sparse_conv3d_apply(feat: jnp.ndarray, neighbors: jnp.ndarray,
                        weights: jnp.ndarray) -> jnp.ndarray:
    """feat [B, V, Cin], neighbors [B, Vout, K], weights [K, Cin, Cout] →
    [B, Vout, Cout] (zero contribution from absent taps)."""
    B, V, Cin = feat.shape
    K = neighbors.shape[2]
    safe = jnp.clip(neighbors, 0, V - 1)

    def one(f, nb):
        g = f[nb.reshape(-1)].reshape(nb.shape + (Cin,))
        return g

    gathered = jax.vmap(one)(feat, safe)  # [B, Vout, K, Cin]
    gathered = jnp.where(neighbors[..., None] >= 0, gathered, 0.0)
    Vout = neighbors.shape[1]
    flat = gathered.reshape(B, Vout, K * Cin)
    return jnp.einsum('bvk,kc->bvc', flat,
                      weights.reshape(K * Cin, weights.shape[-1]))


def downsample_coords_3d(coords_zyx: jnp.ndarray, mask: jnp.ndarray,
                         grid_dhw: tuple, stride, padding, kernel: int,
                         max_out: int):
    """Output active set of SparseConv3d(kernel, stride, padding): all output
    cells whose receptive field touches an active input, deduplicated sort-free.
    stride/padding may be ints or (z, y, x) tuples."""
    D, H, W = grid_dhw
    st = np.broadcast_to(np.asarray(stride), (3,))
    pd = np.broadcast_to(np.asarray(padding), (3,))
    out_dhw = tuple(
        (np.array([D, H, W]) + 2 * pd - kernel) // st + 1
    )
    # candidate outputs per input voxel: o in [ceil((c+pad-k+1)/s), (c+pad)/s]
    cands = []
    for axis in range(3):
        c = coords_zyx[..., axis]
        lo = -(-(c + pd[axis] - kernel + 1) // st[axis])
        hi = (c + pd[axis]) // st[axis]
        n_c = int(np.ceil((kernel) / st[axis]))  # max candidates per axis
        idx = lo[..., None] + jnp.arange(n_c)[None, None]
        ok = (idx <= hi[..., None]) & (idx >= 0) & (
            idx < out_dhw[axis]
        )
        cands.append((idx, ok))
    (iz, okz), (iy, oky), (ix, okx) = cands
    nz, ny, nx = iz.shape[-1], iy.shape[-1], ix.shape[-1]
    z = jnp.repeat(jnp.repeat(iz, ny, -1), nx, -1)
    y = jnp.tile(jnp.repeat(iy, nx, -1), (1, 1, nz))
    x = jnp.tile(ix, (1, 1, nz * ny))
    okz_ = jnp.repeat(jnp.repeat(okz, ny, -1), nx, -1)
    oky_ = jnp.tile(jnp.repeat(oky, nx, -1), (1, 1, nz))
    okx_ = jnp.tile(okx, (1, 1, nz * ny))
    ok = okz_ & oky_ & okx_ & mask[..., None]
    Do, Ho, Wo = out_dhw
    sent = int(Do * Ho * Wo)
    ids = jnp.where(ok, (z * Ho + y) * Wo + x, sent)
    B = ids.shape[0]
    slot_ids, _, _ = jax.vmap(
        lambda i: _grid_compact(i, sent, max_out)
    )(ids.reshape(B, -1))
    new_mask = slot_ids < sent
    zz = jnp.where(new_mask, slot_ids // (Ho * Wo), 0)
    yy = jnp.where(new_mask, (slot_ids // Wo) % Ho, 0)
    xx = jnp.where(new_mask, slot_ids % Wo, 0)
    coords = jnp.stack([zz, yy, xx], -1).astype(jnp.int32)
    return coords, new_mask, (int(Do), int(Ho), int(Wo))
