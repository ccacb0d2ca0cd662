"""Occupancy-aware 3x3 submanifold convolution on the dense BEV carrier.

The reference's SubMConv2d (spconv) computes outputs only at ACTIVE sites
(`pcdet/utils/spconv_utils.py:40-56`); our dense `nn.Conv` equivalent pays the
full 468² grid (~2.4 ms per 128ch conv at B=2) for ~10-25% occupied cells.
This kernel computes only the occupied 8x8 windows: each grid step assembles
the window's 3x3 neighbor blocks from the padded grid in VMEM, does the 3x3
conv as ONE im2col matmul ([w*w, 9C] x [9C, Cout] — full-depth MXU work), and
writes the masked window block. Unvisited output blocks stay zero via a
zero-initialized aliased output (zeros init is one cheap memset vs the dense
conv's full compute).

Plan inputs reuse the per-stage compaction plan (ops/occ_compact.py): the
UNSHIFTED occupied-window indices + per-cell occupancy masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense_windows import window_geometry

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _use_pallas():
    return _INTERPRET or jax.default_backend() == 'tpu'


def _conv_kernel(wy_ref, wx_ref, x00, x01, x02, x10, x11, x12, x20, x21, x22,
                 qm_ref, wmat_ref, b_ref, o_ref, *, window, cin, cout):
    w = window
    # assemble the (3w, 3w, C) neighborhood; rows/cols are above the lane dim
    rows = [jnp.concatenate([a[0], b[0], c[0]], axis=1)
            for a, b, c in ((x00, x01, x02), (x10, x11, x12), (x20, x21, x22))]
    nb = jnp.concatenate(rows, axis=0)            # [3w, 3w, C]
    # conv = sum of 9 shifted-window matmuls (lane-concat of misaligned
    # slices is unsupported in Mosaic; per-tap full-C contractions are the
    # same FLOPs as the im2col form)
    out = jnp.broadcast_to(b_ref[0], (w * w, cout)).astype(jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = nb[w - 1 + ky:2 * w - 1 + ky,
                     w - 1 + kx:2 * w - 1 + kx, :].reshape(w * w, cin)
            wk = wmat_ref[(3 * ky + kx) * cin:(3 * ky + kx + 1) * cin, :]
            out = out + jax.lax.dot_general(
                tap, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # SubM: active sites only (qm ships as an f32 [w, w] tile; minor-dim
    # insertion is 32-bit-only in Mosaic, so mask in f32 before the cast)
    out = out.reshape(w, w, cout) * qm_ref[0, 0][..., None]
    o_ref[0, 0] = out.reshape(w * w, cout).astype(o_ref.dtype)


def _subm_conv_pallas(xg, idx, qmask, wmat, bias, grid_hw, window):
    B, H, W, C = xg.shape
    cap = idx.shape[1]
    cout = wmat.shape[-1]
    w = window
    nwy, nwx, Hp, Wp = window_geometry((H, W), w)
    # pad generously: 1 window margin all around + dummy row; neighbor blocks
    # of any real window stay in bounds
    xp = jnp.pad(xg, ((0, 0), (w, Hp + 2 * w - H - w), (w, Wp + w - W - w),
                      (0, 0)))
    wy, wx = idx[..., 0], idx[..., 1]
    dt = xg.dtype

    def nb_spec(dy, dx):
        # dy/dx in {0,1,2} -> neighbor blocks wy-1..wy+1 (center at 1)
        return pl.BlockSpec(
            (1, w, w, C),
            lambda b, i, wy_ref, wx_ref, dy=dy, dx=dx: (
                b, wy_ref[b, i] + dy - 1, wx_ref[b, i] + dx - 1, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [nb_spec(dy, dx) for dy in range(3) for dx in range(3)]
    in_specs.append(pl.BlockSpec((1, 1, w, w), lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((9 * C, cout), lambda *_: (0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, cout), lambda *_: (0, 0),
                                 memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec(
        (1, 1, w * w, cout), lambda b, i, *_: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_conv_kernel, window=w, cin=C, cout=cout)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, cap, w * w, cout), dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, cap),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        interpret=_INTERPRET,
    )(wy, wx, *([xp] * 9), qmask.astype(jnp.float32).reshape(B, cap, w, w),
      wmat.reshape(9 * C, cout).astype(dt),
      bias.reshape(1, cout).astype(jnp.float32))
    return out


def _scatter_out(out_w, idx, grid_hw, window, cout, dtype):
    """Compact [B, cap, w*w, Cout] → dense [B, H, W, Cout], zeros elsewhere."""
    from .occ_compact import scatter_windows

    return scatter_windows(out_w, idx, grid_hw, window, False,
                           zero_fill=True)


def _subm_conv_ref(xg, idx, qmask, wmat, bias, grid_hw, window):
    """jnp reference: dense conv + window mask (bit-identical semantics)."""
    B, H, W, C = xg.shape
    out = jax.lax.conv_general_dilated(
        xg.astype(jnp.float32), wmat.astype(jnp.float32),
        window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    ) + bias
    # zero outside the occupied windows + at unoccupied cells (qmask)
    occ_d = _scatter_out(
        qmask[..., None].astype(jnp.float32)
        * jnp.ones((1, 1, 1, 8), jnp.float32),
        idx, grid_hw, window, 8, jnp.float32)
    return (out * (occ_d[..., :1] > 0)).astype(xg.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def subm_conv3x3(xg, idx, qmask, wmat, bias, grid_hw, window: int):
    """Occupancy-aware 3x3 SubM conv: xg [B, H, W, Cin] → [B, H, W, Cout],
    computed only at the occupied windows named by ``idx`` (cells masked per
    ``qmask``), zeros elsewhere."""
    if _use_pallas():
        out_w = _subm_conv_pallas(xg, idx, qmask, wmat, bias, grid_hw, window)
        return _scatter_out(out_w, idx, grid_hw, window, wmat.shape[-1],
                            xg.dtype)
    return _subm_conv_ref(xg, idx, qmask, wmat, bias, grid_hw, window)


def _fwd(xg, idx, qmask, wmat, bias, grid_hw, window):
    out = subm_conv3x3(xg, idx, qmask, wmat, bias, grid_hw, window)
    return out, (xg, idx, qmask, wmat, bias)


def _bwd(grid_hw, window, res, g):
    """XLA backward (training path): dense transposed conv of the masked
    cotangent + weight grads via conv; exact because the forward equals a
    dense conv masked to the occupied windows."""
    xg, idx, qmask, wmat, bias = res
    f32 = jnp.float32
    occ_d = _scatter_out(
        qmask[..., None].astype(f32) * jnp.ones((1, 1, 1, 8), f32),
        idx, grid_hw, window, 8, f32)
    gm = (g.astype(f32) * (occ_d[..., :1] > 0))
    # dx: correlate with flipped kernel (transposed conv, stride 1, SAME)
    wflip = jnp.flip(wmat, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        gm, wflip.astype(f32), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # dw[ky, kx, i, o] = sum_bhw x[h+ky-1, w+kx-1, i] * gm[h, w, o]
    xf = xg.astype(f32)
    dw = jax.lax.conv_general_dilated(
        xf.transpose(3, 1, 2, 0), gm.transpose(1, 2, 0, 3),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    ).transpose(1, 2, 0, 3)
    db = jnp.sum(gm, axis=(0, 1, 2))
    return (dx.astype(xg.dtype), np.zeros(idx.shape, jax.dtypes.float0),
            jnp.zeros_like(qmask), dw.astype(wmat.dtype),
            db.astype(bias.dtype))


subm_conv3x3.defvjp(_fwd, _bwd)
