"""Pallas TPU kernel: fully-fused SST encoder layer.

One kernel = cosine window attention + post-LN residual + FFN (GELU) + post-LN,
over a tile of windows resident in VMEM (reference semantics:
``sst_basic_block.py:57-84`` / ``wca_block.py:70-103``). The unfused XLA path
makes ~8 full-grid HBM passes per layer (LayerNorms and element-wise masking are
bandwidth-bound at 468²x128); this kernel reads the window tensor once and writes
it once.

Forward-only Pallas; a ``jax.custom_vjp`` backward differentiates the identical
jnp reference (``reference_encoder_layer``), so training works transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_WINDOWS = 16  # 32 wins ~7% standalone but loses ~5% in-model (and compiles 2x slower)

# Tile width of the round-5 fused DMA+layer kernels only (the rows/sel
# kernels stay coupled to TILE_WINDOWS via round_cap). Larger tiles amortize
# per-descriptor DMA issue cost when every cap divides it.
import os as _os_pe  # noqa: E402

FUSED_TW = int(_os_pe.environ.get('TMAE_FUSED_TW', '32'))

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — Mosaic has no
    erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return s * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _head_mask_mats(nhead, C):
    """([C, H], [H, C]) head-membership matrices built from iota in-kernel."""
    D = C // nhead
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, nhead), 0)
    hi = jax.lax.broadcasted_iota(jnp.int32, (C, nhead), 1)
    m = (ci // D == hi).astype(jnp.float32)
    cit = jax.lax.broadcasted_iota(jnp.int32, (nhead, C), 1)
    hit = jax.lax.broadcasted_iota(jnp.int32, (nhead, C), 0)
    mt = (cit // D == hit).astype(jnp.float32)
    return m, mt


def _head_mask(h, D, C, dtype=jnp.float32):
    """[1, 1, C] lane mask selecting head ``h``'s channels — built from iota so
    no lane-dim slicing (Mosaic relayouts on sub-128-lane slices are the single
    most expensive op in the naive per-head loop: ~1.2 ms/head at 7200
    windows)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    return ((lane >= h * D) & (lane < (h + 1) * D)).astype(dtype)


def _headwise_lane_sum(x3, mask_mat, mask_mat_t):
    """Per-head lane sums of x3 [W, T, C], broadcast back onto the lanes of
    each head: [W, T, C] → [W, T, C] (each lane holds its head's sum)."""
    W, T, C = x3.shape
    s = jax.lax.dot_general(x3.reshape(W * T, C), mask_mat,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)    # [WT, H]
    s_lanes = jax.lax.dot_general(s, mask_mat_t, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    return s_lanes.reshape(W, T, C)


def _cosine_normalize(x3, mask_mat, mask_mat_t, return_r=False):
    """Per-head L2 normalization without lane slicing: per-head squared norms
    via a [C, H] mask matmul, broadcast back to lanes via its transpose."""
    n_lanes = _headwise_lane_sum(x3 * x3, mask_mat, mask_mat_t)
    r_lanes = jax.lax.rsqrt(n_lanes + 1e-24)
    xn = x3 * r_lanes
    if return_r:
        return xn, r_lanes
    return xn


def _attention_core_sliced(q, k, v, km, tau, nhead, tau_min, W, T, C):
    """Per-head cosine attention via lane slicing — fast when the head width is
    a tile-friendly 32+ lanes (e.g. C=256, H=8); at D=16 the slice relayouts
    dominate and the masked variant below wins (measured ~1.2 ms/head).

    Normalization runs in f32 (rsqrt stability); the attention matmuls run with
    bf16 inputs + f32 accumulation — same numerics class as the reference's
    fp16 AMP attention (train.py --amp), ~4x the MXU rate of f32 inputs."""
    H, D = nhead, C // nhead
    bf = jnp.bfloat16
    scale = 1.0 / jnp.maximum(tau, tau_min)
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]
    q3 = q.reshape(W, T, C)
    k3 = k.reshape(W, T, C)
    v3 = v.reshape(W, T, C)
    outs = []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh = q3[:, :, sl]
        kh = k3[:, :, sl]
        vh = v3[:, :, sl].astype(bf)
        qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
        kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
        logits = jax.lax.dot_general(
            (qh * scale).astype(bf), kh.astype(bf),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(km[:, None, :] > 0, logits, -30000.0)
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.where(has_key, p, 0.0)
        outs.append(
            jax.lax.dot_general(
                p.astype(bf), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=-1).reshape(W * T, C)


def _attention_core(q, k, v, km, tau, nhead, tau_min, W, T, C,
                    mask_mat, mask_mat_t):
    """Cosine multi-head attention where every matmul contracts the full lane
    width: head separation comes from lane masks (zeroing the other heads'
    channels), so the MXU runs at full contraction depth and Mosaic never
    relayouts. Attention matmuls take bf16 inputs with f32 accumulation (the
    reference runs these under fp16 AMP); normalization stays f32."""
    H, D = nhead, C // nhead
    bf = jnp.bfloat16
    scale = 1.0 / jnp.maximum(tau, tau_min)
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]
    q3 = q.reshape(W, T, C)
    k3 = k.reshape(W, T, C)
    v3 = v.reshape(W, T, C)
    qn = (_cosine_normalize(q3, mask_mat, mask_mat_t) * scale).astype(bf)
    kn = _cosine_normalize(k3, mask_mat, mask_mat_t).astype(bf)
    v3 = v3.astype(bf)
    out = jnp.zeros((W, T, C), jnp.float32)
    for h in range(H):
        mh = _head_mask(h, D, C, bf)
        logits = jax.lax.dot_general(
            qn * mh, kn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(km[:, None, :] > 0, logits, -30000.0)
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.where(has_key, p, 0.0)
        out = out + jax.lax.dot_general(
            p.astype(bf), v3 * mh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    return out.reshape(W * T, C)


def _layer_body(x, kv, qmask, kmask, pos, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, tau_ref, ln1s_ref, ln1b_ref,
                f1w_ref, f1b_ref, f2w_ref, f2b_ref, ln2s_ref, ln2b_ref,
                nhead, tau_min, cross):
    """Shared kernel body: [W, T, C] window tokens → [W, T, C] output."""
    W, T, C = x.shape
    pos = pos[:]
    dt = x.dtype
    xp = (x + pos[None]).reshape(W * T, C)
    q = jnp.dot(xp, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[0]
    kvp = (kv + pos[None]).reshape(W * T, C) if cross else xp
    k = jnp.dot(kvp, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[0]
    v = jnp.dot(kv.reshape(W * T, C), wv_ref[:],
                preferred_element_type=jnp.float32) + bv_ref[0]
    if C // nhead < 32:
        mask_mat, mask_mat_t = _head_mask_mats(nhead, C)
        attn = _attention_core(q, k, v, kmask, tau_ref[0, 0], nhead,
                               tau_min, W, T, C, mask_mat, mask_mat_t)
    else:
        attn = _attention_core_sliced(q, k, v, kmask, tau_ref[0, 0],
                                      nhead, tau_min, W, T, C)
    attn = jnp.dot(attn.astype(dt), wo_ref[:],
                   preferred_element_type=jnp.float32) + bo_ref[0]
    # attention delta lands only on occupied query cells. Keep (W, T, C) layout:
    # Mosaic can't reshape (W, T) → (W*T, 1) (lane-dim change).
    qm = qmask[..., None] > 0  # [W, T, 1]
    x32 = x.astype(jnp.float32)
    h = _ln(x32 + jnp.where(qm, attn.reshape(W, T, C), 0.0),
            ln1s_ref[0], ln1b_ref[0])
    h = jnp.where(qm, h, 0.0)
    ff = jnp.dot(h.reshape(W * T, C).astype(dt), f1w_ref[:],
                 preferred_element_type=jnp.float32) + f1b_ref[0]
    ff = _gelu_exact(ff)
    ff = jnp.dot(ff.astype(dt), f2w_ref[:],
                 preferred_element_type=jnp.float32) + f2b_ref[0]
    out = _ln(h + ff.reshape(W, T, C), ln2s_ref[0], ln2b_ref[0])
    return jnp.where(qm, out, 0.0)


def _kernel(x_ref, kv_ref, qmask_ref, kmask_ref, pos_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
            tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref,
            ln2s_ref, ln2b_ref, o_ref, *, nhead, tau_min, cross):
    x = x_ref[:]
    kv = kv_ref[:] if cross else x
    out = _layer_body(
        x, kv, qmask_ref[:], kmask_ref[:], pos_ref, wq_ref, bq_ref, wk_ref,
        bk_ref, wv_ref, bv_ref, wo_ref, bo_ref, tau_ref, ln1s_ref, ln1b_ref,
        f1w_ref, f1b_ref, f2w_ref, f2b_ref, ln2s_ref, ln2b_ref,
        nhead, tau_min, cross,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _win_split(tile, TWX, w, C):
    """In-VMEM rearrangement (w, w*TWX, C) → (TWX, w*w, C): splitting and
    swapping dims above the (sublane, lane) tile moves whole tiles, so Mosaic
    lowers it to copies, not element shuffles (unlike the same transpose in
    HBM, which costs ~4 ms per view at 468²). The lane dim C never changes —
    channel-less arrays must carry a small lane dim (the occupancy ships as
    8 lanes) because lane-dim reshapes are unsupported."""
    t = tile.reshape(w, TWX, w, C)
    return t.transpose(1, 0, 2, 3).reshape(TWX, w * w, C)


def _win_merge(xw, TWX, w, C):
    """Inverse of _win_split for the output tile."""
    t = xw.reshape(TWX, w, w, C)
    return t.transpose(1, 0, 2, 3).reshape(w, TWX * w, C)


def _grid_kernel(x_ref, kv_ref, qocc_ref, kocc_ref, pos_ref,
                 wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                 bo_ref, tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref,
                 f2w_ref, f2b_ref, ln2s_ref, ln2b_ref, o_ref,
                 *, nhead, tau_min, cross, window, twx):
    """Grid-native variant: reads a (1, w, w*TWX, C) strip of the padded dense
    BEV grid and rearranges to windows in VMEM — no HBM window_view/unview and
    no separate occupancy view."""
    w, TWX = window, twx
    C = x_ref.shape[-1]
    x = _win_split(x_ref[0], TWX, w, C)
    kv = _win_split(kv_ref[0], TWX, w, C) if cross else x
    # occupancy arrives as 8 identical lanes; reduce after the rearrangement
    qmask = jnp.max(_win_split(qocc_ref[0], TWX, w, 8), axis=-1)
    kmask = (jnp.max(_win_split(kocc_ref[0], TWX, w, 8), axis=-1)
             if cross else qmask)
    out = _layer_body(
        x, kv, qmask, kmask, pos_ref, wq_ref, bq_ref, wk_ref, bk_ref,
        wv_ref, bv_ref, wo_ref, bo_ref, tau_ref, ln1s_ref, ln1b_ref,
        f1w_ref, f1b_ref, f2w_ref, f2b_ref, ln2s_ref, ln2b_ref,
        nhead, tau_min, cross,
    )
    o_ref[0] = _win_merge(out, TWX, w, C).astype(o_ref.dtype)


def reference_encoder_layer(xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv,
                            wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s,
                            ln2b, nhead, tau_min, cross):
    """jnp reference of the fused layer (used on CPU and as the VJP source)."""
    f32 = jnp.float32
    kv = kvw if cross else xw
    xp = (xw + pos[None]).astype(f32)
    q = xp @ wq.astype(f32) + bq
    kvp = (kv + pos[None]).astype(f32) if cross else xp
    k = kvp @ wk.astype(f32) + bk
    v = kv.astype(f32) @ wv.astype(f32) + bv
    N, T, C = xw.shape
    H, D = nhead, C // nhead
    qh = q.reshape(N, T, H, D)
    kh = k.reshape(N, T, H, D)
    vh = v.reshape(N, T, H, D)
    qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
    kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
    scale = 1.0 / jnp.maximum(tau[0], tau_min)
    logits = jnp.einsum('nthd,nshd->nhts', qh * scale, kh)
    logits = jnp.where(kmask[:, None, None, :] > 0, logits, -30000.0)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(jnp.any(kmask > 0, -1)[:, None, None, None], p, 0.0)
    attn = jnp.einsum('nhts,nshd->nthd', p, vh).reshape(N, T, C)
    attn = attn @ wo.astype(f32) + bo
    qm = qmask[..., None]
    h = _ln(xw.astype(f32) + jnp.where(qm > 0, attn, 0.0), ln1s, ln1b)
    h = jnp.where(qm > 0, h, 0.0)
    ff = jax.nn.gelu(h @ f1w.astype(f32) + f1b, approximate=False)
    ff = ff @ f2w.astype(f32) + f2b
    out = _ln(h + ff, ln2s, ln2b)
    return jnp.where(qm > 0, out, 0.0).astype(xw.dtype)


def _pallas_forward(xw, kvw, qmask, kmask, pos, *params, nhead, tau_min, cross):
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    N, T, C = xw.shape
    F = f1w.shape[1]
    TW = TILE_WINDOWS
    padded = ((N + TW - 1) // TW) * TW
    if padded != N:
        padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
        xw, kvw, qmask, kmask = (padz(xw), padz(kvw), padz(qmask), padz(kmask))
    dt = xw.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    vec_specs = [
        pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    param_specs = [
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    ]
    kernel = functools.partial(_kernel, nhead=nhead, tau_min=tau_min,
                               cross=cross)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, T, C), xw.dtype),
        grid_spec=pl.GridSpec(
            grid=(padded // TW,),
            in_specs=vec_specs + param_specs,
            out_specs=pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xw, kvw, qmask.astype(jnp.float32), kmask.astype(jnp.float32), pos,
      mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
      tau.reshape(1, 1).astype(jnp.float32), row(ln1s), row(ln1b),
      mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s), row(ln2b))
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(22, 23, 24))
def fused_encoder_layer(xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv,
                        wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s,
                        ln2b, nhead: int, tau_min: float, cross: bool):
    """Fused attention+LN+FFN+LN over windowed tokens. xw/kvw [N, T, C];
    qmask/kmask [N, T]; FFN width = f1w.shape[1]."""
    return _pallas_forward(
        xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau,
        ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
        nhead=nhead, tau_min=tau_min, cross=cross,
    )


def _fwd(xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau,
         ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b, nhead, tau_min, cross):
    out = _pallas_forward(
        xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau,
        ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
        nhead=nhead, tau_min=tau_min, cross=cross,
    )
    return out, (xw, kvw, qmask, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                 tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b)


BWD_CHUNK = 512  # windows per backward recompute chunk (bounds logits memory)


USE_PALLAS_BWD = True


def _bwd(nhead, tau_min, cross, residuals, g):
    """Backward dispatch: the fused Pallas backward kernel on TPU (one HBM
    pass, VMEM-resident recompute), else the chunked XLA-recompute path."""
    xw, kvw, qmask, kmask, pos = residuals[:5]
    weights = residuals[5:]
    T, C = xw.shape[1], xw.shape[2]
    pallas_ok = (C % 128 == 0 and T % 8 == 0)
    if USE_PALLAS_BWD and pallas_ok and (
        _INTERPRET or jax.default_backend() == 'tpu'
    ):
        outs = _pallas_backward(
            xw, kvw, qmask, kmask, pos, tuple(weights), g,
            nhead=nhead, tau_min=tau_min, cross=cross,
        )
        dx, dkv = outs[0], outs[1]
        gw = outs[2:19]
        dpos = outs[19]
        return (dx, dkv, jnp.zeros_like(qmask), jnp.zeros_like(kmask),
                dpos) + tuple(gw)
    return _bwd_recompute(nhead, tau_min, cross, residuals, g)


def _bwd_recompute(nhead, tau_min, cross, residuals, g):
    """Chunked backward: re-derives the layer per window-chunk so the recomputed
    attention logits ([chunk, H, T, T]) never exceed a bounded footprint —
    without this, differentiating the whole layer materializes ~0.5 GB of logits
    per layer and B=4 training overflows a 16 GB chip."""
    xw, kvw, qmask, kmask, pos = residuals[:5]
    weights = residuals[5:]
    N = xw.shape[0]
    C = BWD_CHUNK
    padded = ((N + C - 1) // C) * C
    padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
    xw_p, kvw_p, qm_p, km_p, g_p = (padz(xw), padz(kvw), padz(qmask),
                                    padz(kmask), padz(g))
    nchunk = padded // C
    resh = lambda a: a.reshape(nchunk, C, *a.shape[1:])
    xs = (resh(xw_p), resh(kvw_p), resh(qm_p), resh(km_p), resh(g_p))

    def chunk_grad(carry, chunk):
        cxw, ckvw, cqm, ckm, cg = chunk

        def f(cx, ckv, *w):
            return reference_encoder_layer(
                cx, ckv, cqm, ckm, pos, *w, nhead=nhead, tau_min=tau_min,
                cross=cross,
            )

        _, vjp = jax.vjp(f, cxw, ckvw, *weights)
        grads = vjp(cg)
        gx, gkv = grads[0], grads[1]
        gw = grads[2:]
        carry = jax.tree.map(jnp.add, carry, tuple(gw))
        return carry, (gx, gkv)

    w_zero = tuple(jnp.zeros_like(w) for w in weights)
    gw_sum, (gx_all, gkv_all) = jax.lax.scan(chunk_grad, w_zero, xs)
    gx = gx_all.reshape(padded, *xw.shape[1:])[:N]
    gkv = gkv_all.reshape(padded, *kvw.shape[1:])[:N]
    gq = jnp.zeros_like(qmask)
    gk = jnp.zeros_like(kmask)
    gpos = jnp.zeros_like(pos)
    return (gx, gkv, gq, gk, gpos) + gw_sum


fused_encoder_layer.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused Pallas backward kernel
# ---------------------------------------------------------------------------
# One kernel recomputes the forward intermediates for a tile of windows in
# VMEM (flash-attention-style) and produces dx / dkv plus all weight
# gradients, accumulated across grid steps into block-0-mapped f32 outputs.
# Replaces the chunked XLA-recompute backward (kept as _bwd_recompute for
# CPU and as a fallback).

BWD_TILE_WINDOWS = 16


def _ln_fwd_stats(x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return xc * inv, inv


def _ln_bwd(g, xhat, inv, scale):
    """d/dx of LN given upstream g, normalized xhat, inv std, scale."""
    gs = g * scale
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    return inv * (gs - m1 - xhat * m2)


def _gelu_grad(x):
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327
    return 0.5 * (1.0 + _erf(x * 0.7071067811865476)) + x * phi


def _bwd_kernel(x_ref, kv_ref, qmask_ref, kmask_ref, pos_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                bo_ref, tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref,
                f2w_ref, f2b_ref, ln2s_ref, ln2b_ref, g_ref,
                dx_ref, dkv_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwv_ref, dbv_ref, dwo_ref, dbo_ref, dtau_ref, dln1s_ref,
                dln1b_ref, df1w_ref, df1b_ref, df2w_ref, df2b_ref,
                dln2s_ref, dln2b_ref, dpos_ref,
                *, nhead, tau_min, cross):
    W, T, C = x_ref.shape
    H, D = nhead, C // nhead
    f32 = jnp.float32
    bf = jnp.bfloat16

    def dotb(a, b, dims=None):
        """Matmul with bf16 inputs + f32 accumulation — the reference trains
        these layers under fp16 AMP; bf16 operands run the MXU at ~4x the f32
        rate. Gradient accumulators stay f32."""
        a = a.astype(bf)
        b = b.astype(bf)
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=f32)
        return jax.lax.dot_general(a, b, dims, preferred_element_type=f32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref, dtau_ref, dln1s_ref, dln1b_ref,
                  df1w_ref, df1b_ref, df2w_ref, df2b_ref, dln2s_ref,
                  dln2b_ref, dpos_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[:].astype(f32)
    kv = kv_ref[:].astype(f32) if cross else x
    pos = pos_ref[:].astype(f32)
    qm3 = qmask_ref[:][..., None] > 0             # [W, T, 1]
    km = kmask_ref[:]                              # [W, T]
    g = g_ref[:].astype(f32)
    tau = tau_ref[0, 0]
    scale = 1.0 / jnp.maximum(tau, tau_min)
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]

    # ---- forward recompute (all f32, VMEM-resident) ----
    xp = (x + pos[None]).reshape(W * T, C)
    q = dotb(xp, wq_ref[:]) + bq_ref[0]
    kvp = (kv + pos[None]).reshape(W * T, C) if cross else xp
    k = dotb(kvp, wk_ref[:]) + bk_ref[0]
    v = dotb(kv.reshape(W * T, C), wv_ref[:]) + bv_ref[0]
    q3 = q.reshape(W, T, C)
    k3 = k.reshape(W, T, C)
    v3 = v.reshape(W, T, C)

    masked_heads = D < 32  # lane-mask formulation beats slice relayouts at D=16
    if masked_heads:
        mask_mat, mask_mat_t = _head_mask_mats(H, C)
        qn, rql = _cosine_normalize(q3, mask_mat, mask_mat_t, return_r=True)
        kn, rkl = _cosine_normalize(k3, mask_mat, mask_mat_t, return_r=True)

        def head_attn(h):
            mh = _head_mask(h, D, C)
            dots = dotb(qn * mh, kn, (((2,), (2,)), ((0,), (0,))))
            logits = jnp.where(km[:, None, :] > 0, dots * scale, -30000.0)
            p_z = jnp.where(has_key, jax.nn.softmax(logits, axis=-1), 0.0)
            return mh, p_z, dots

        a_acc = jnp.zeros((W, T, C), f32)
        cache = []
        for h in range(H):
            head = head_attn(h)
            cache.append(head)
            a_acc = a_acc + dotb(head[1], v3 * head[0],
                                 (((2,), (1,)), ((0,), (0,))))
        a = a_acc.reshape(W * T, C)
        del a_acc
    else:
        cache = []
        a_heads = []
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qh, kh = q3[:, :, sl], k3[:, :, sl]
            rq = jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
            rk = jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
            qnh, knh = qh * rq, kh * rk
            dots = dotb(qnh, knh, (((2,), (2,)), ((0,), (0,))))
            logits = jnp.where(km[:, None, :] > 0, dots * scale, -30000.0)
            p_z = jnp.where(has_key, jax.nn.softmax(logits, axis=-1), 0.0)
            cache.append((qnh, knh, rq, rk, p_z, dots))
            a_heads.append(dotb(p_z, v3[:, :, sl],
                                (((2,), (1,)), ((0,), (0,)))))
        a = jnp.concatenate(a_heads, axis=-1).reshape(W * T, C)
        del a_heads
    attn = dotb(a, wo_ref[:]) + bo_ref[0]
    z1 = x + jnp.where(qm3, attn.reshape(W, T, C), 0.0)
    x1hat, inv1 = _ln_fwd_stats(z1)
    h1 = jnp.where(qm3, x1hat * ln1s_ref[0] + ln1b_ref[0], 0.0)
    ff1 = dotb(h1.reshape(W * T, C), f1w_ref[:]) + f1b_ref[0]
    gg = _gelu_exact(ff1)
    ff2 = dotb(gg, f2w_ref[:]) + f2b_ref[0]
    z2 = h1 + ff2.reshape(W, T, C)
    x2hat, inv2 = _ln_fwd_stats(z2)

    # ---- backward ----
    g_out = jnp.where(qm3, g, 0.0)
    dln2s_ref[0] += jnp.sum((g_out * x2hat).reshape(W * T, C), axis=0)
    dln2b_ref[0] += jnp.sum(g_out.reshape(W * T, C), axis=0)
    dz2 = _ln_bwd(g_out, x2hat, inv2, ln2s_ref[0])

    dff2 = dz2.reshape(W * T, C)
    df2w_ref[:] += dotb(gg.T, dff2)
    df2b_ref[0] += jnp.sum(dff2, axis=0)
    dgg = dotb(dff2, f2w_ref[:].T)
    dff1 = dgg * _gelu_grad(ff1)
    h1f = h1.reshape(W * T, C)
    df1w_ref[:] += dotb(h1f.T, dff1)
    df1b_ref[0] += jnp.sum(dff1, axis=0)
    dh1 = dz2 + dotb(dff1, f1w_ref[:].T).reshape(W, T, C)
    dh1 = jnp.where(qm3, dh1, 0.0)

    dln1s_ref[0] += jnp.sum((dh1 * x1hat).reshape(W * T, C), axis=0)
    dln1b_ref[0] += jnp.sum(dh1.reshape(W * T, C), axis=0)
    dz1 = _ln_bwd(dh1, x1hat, inv1, ln1s_ref[0])

    dx_total = dz1                                  # d wrt residual x
    dattn = jnp.where(qm3, dz1, 0.0).reshape(W * T, C)
    dwo_ref[:] += dotb(a.T, dattn)
    dbo_ref[0] += jnp.sum(dattn, axis=0)
    da = dotb(dattn, wo_ref[:].T).reshape(W, T, C)

    dtau_acc = jnp.zeros((), f32)
    if masked_heads:
        dqn_acc = jnp.zeros((W, T, C), f32)
        dkn_acc = jnp.zeros((W, T, C), f32)
        dv_acc = jnp.zeros((W, T, C), f32)
        for h in range(H):
            mh, p_z, dots = cache[h]
            dah = da * mh                               # full width, no slice
            dp = dotb(dah, v3 * mh, (((2,), (2,)), ((0,), (0,))))  # [W, T, S]
            dv_acc = dv_acc + dotb(p_z, dah, (((1,), (1,)), ((0,), (0,))))
            ds = p_z * (dp - jnp.sum(dp * p_z, axis=-1, keepdims=True))
            dtau_acc += jnp.sum(ds * dots)
            dqn_acc = dqn_acc + scale * dotb(
                ds, kn * mh, (((2,), (1,)), ((0,), (0,))))
            dkn_acc = dkn_acc + scale * dotb(
                ds, qn * mh, (((1,), (1,)), ((0,), (0,))))
        # normalization backward with per-head lane sums (no slicing)
        dq = (rql * (dqn_acc - qn * _headwise_lane_sum(
            dqn_acc * qn, mask_mat, mask_mat_t))).reshape(W * T, C)
        dk = (rkl * (dkn_acc - kn * _headwise_lane_sum(
            dkn_acc * kn, mask_mat, mask_mat_t))).reshape(W * T, C)
        dv = dv_acc.reshape(W * T, C)
    else:
        dq3, dk3, dv3 = [], [], []
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qnh, knh, rq, rk, p_z, dots = cache[h]
            dah = da[:, :, sl]
            dp = dotb(dah, v3[:, :, sl], (((2,), (2,)), ((0,), (0,))))
            dv3.append(dotb(p_z, dah, (((1,), (1,)), ((0,), (0,)))))
            ds = p_z * (dp - jnp.sum(dp * p_z, axis=-1, keepdims=True))
            dtau_acc += jnp.sum(ds * dots)
            dqn = scale * dotb(ds, knh, (((2,), (1,)), ((0,), (0,))))
            dkn = scale * dotb(ds, qnh, (((1,), (1,)), ((0,), (0,))))
            dq3.append(rq * (dqn - qnh * jnp.sum(dqn * qnh, -1,
                                                 keepdims=True)))
            dk3.append(rk * (dkn - knh * jnp.sum(dkn * knh, -1,
                                                 keepdims=True)))
        dq = jnp.concatenate(dq3, axis=-1).reshape(W * T, C)
        dk = jnp.concatenate(dk3, axis=-1).reshape(W * T, C)
        dv = jnp.concatenate(dv3, axis=-1).reshape(W * T, C)
    # d(scale)/d(tau) = -1/tau^2 when tau > tau_min else 0
    dtau_ref[:] += jnp.where(tau > tau_min,
                             -dtau_acc / (tau * tau), 0.0).reshape(1, 1)

    dwv_ref[:] += dotb(kv.reshape(W * T, C).T, dv)
    dbv_ref[0] += jnp.sum(dv, axis=0)
    dkv_total = dotb(dv, wv_ref[:].T).reshape(W, T, C)

    dwq_ref[:] += dotb(xp.T, dq)
    dbq_ref[0] += jnp.sum(dq, axis=0)
    dxp = dotb(dq, wq_ref[:].T).reshape(W, T, C)

    dwk_ref[:] += dotb(kvp.T, dk)
    dbk_ref[0] += jnp.sum(dk, axis=0)
    dkvp = dotb(dk, wk_ref[:].T).reshape(W, T, C)

    if cross:
        dx_total = dx_total + dxp
        dkv_total = dkv_total + dkvp
        dpos_ref[:] += jnp.sum(dxp + dkvp, axis=0)
        dkv_ref[:] = dkv_total.astype(dkv_ref.dtype)
    else:
        # kv aliases x: the v-path gradient folds into dx, dkv is zero
        dx_total = dx_total + dxp + dkvp + dkv_total
        dpos_ref[:] += jnp.sum(dxp + dkvp, axis=0)
        dkv_ref[:] = jnp.zeros(dkv_ref.shape, dkv_ref.dtype)

    dx_ref[:] = dx_total.astype(dx_ref.dtype)


def _pallas_backward(xw, kvw, qmask, kmask, pos, params, g, *, nhead,
                     tau_min, cross):
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    N, T, C = xw.shape
    F = f1w.shape[1]
    TW = BWD_TILE_WINDOWS
    padded = ((N + TW - 1) // TW) * TW
    if padded != N:
        padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
        xw, kvw, qmask, kmask, g = (padz(xw), padz(kvw), padz(qmask),
                                    padz(kmask), padz(g))
    dt = xw.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    tile3 = pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((TW, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        tile3, tile3, tile2, tile2, wspec((T, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)), wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
        tile3,  # g
    ]
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((padded, T, C), jnp.float32),   # dx
        jax.ShapeDtypeStruct((padded, T, C), jnp.float32),   # dkv
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, 1), f32),                    # dtau
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, F), f32), jax.ShapeDtypeStruct((1, F), f32),
        jax.ShapeDtypeStruct((F, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((T, C), f32),                    # dpos
    )
    out_specs = (
        tile3, tile3,
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
        wspec((T, C)),
    )
    kernel = functools.partial(_bwd_kernel, nhead=nhead, tau_min=tau_min,
                               cross=cross)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pl.GridSpec(
            grid=(padded // TW,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xw, kvw, qmask.astype(jnp.float32), kmask.astype(jnp.float32), pos,
      mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
      tau.reshape(1, 1).astype(jnp.float32), row(ln1s), row(ln1b),
      mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s), row(ln2b), g)
    (dx, dkv, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dtau, dln1s, dln1b,
     df1w, df1b, df2w, df2b, dln2s, dln2b, dpos) = outs
    shp = lambda gr, w: gr.reshape(w.shape).astype(w.dtype)
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    return (
        dx[:N].astype(xw.dtype), dkv[:N].astype(kvw.dtype),
        shp(dwq, wq), shp(dbq, bq), shp(dwk, wk), shp(dbk, bk),
        shp(dwv, wv), shp(dbv, bv), shp(dwo, wo), shp(dbo, bo),
        shp(dtau, tau), shp(dln1s, ln1s), shp(dln1b, ln1b),
        shp(df1w, f1w), shp(df1b, f1b), shp(df2w, f2w), shp(df2b, f2b),
        shp(dln2s, ln2s), shp(dln2b, ln2b), dpos.astype(pos.dtype),
    )


# ---------------------------------------------------------------------------
# Token-bucketed ("sel") variant: windows whose occupied-cell count fits in
# S = small_tokens slots run the layer at T = S instead of T = window**2.
# The kernel reads the full [TW, T64, C] window tile (HBM traffic unchanged)
# but packs the S occupied cells in VMEM via one-hot matmuls, so projections
# and FFN shrink T64/S-fold and attention (T64/S)**2-fold. This is the TPU
# analog of the reference's DROP_INFO region batching
# (spt_backbone.py:47-71, sst_utils.py:118-160).
# ---------------------------------------------------------------------------


def _group_matrices(nhead, S, dtype=jnp.float32):
    """Constants for head-packed attention with L = nhead*S packed lanes:
    Tmat [S, L] tiles a per-key row mask over every head's lane group;
    G [L, L] block-diag ones sums exp-logits within each head's group."""
    L = nhead * S
    j = jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    s = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    tmat = (j % S == s).astype(dtype)
    ji = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    g = (ji // S == jj // S).astype(dtype)
    return tmat, g


def _attention_core_packed(q, k, v, km, tau, nhead, tau_min, W, S, C,
                           mask_mat, mask_mat_t):
    """Cosine multi-head attention for S-token windows with ALL heads packed
    into one logits matmul and one AV matmul.

    K_cat/V_cat [W, H*S, C] hold head-masked copies of the keys/values, so
    logits [W, S, H*S] and the AV contraction run at full 128-lane width and
    depth on the MXU — no per-head loop, ~H x fewer dispatches. Softmax is
    normalized per head-group by a block-diagonal ones matmul; the shift is
    the per-row max over ALL groups, which cancels exactly within each group
    (softmax is shift-invariant), so the math equals per-head softmax."""
    H = nhead
    L = H * S
    bf = jnp.bfloat16
    f32 = jnp.float32
    scale = 1.0 / jnp.maximum(tau, tau_min)
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]
    q3 = q.reshape(W, S, C)
    k3 = k.reshape(W, S, C)
    v3 = v.reshape(W, S, C)
    qn = (_cosine_normalize(q3, mask_mat, mask_mat_t) * scale).astype(bf)
    kn = _cosine_normalize(k3, mask_mat, mask_mat_t)
    # head-masked packed copies: [W, H, S, C] -> [W, H*S, C] (merge above the
    # lane dim, legal in Mosaic)
    hmask = _head_mask_rows(H, C)                       # [H, 1, C]
    kcat = (kn[:, None] * hmask[None]).reshape(W, L, C).astype(bf)
    vcat = (v3[:, None] * hmask[None]).reshape(W, L, C).astype(bf)
    tmat, g = _group_matrices(H, S)
    kmcat = jax.lax.dot_general(                         # [W, L] key mask
        km, tmat, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    logits = jax.lax.dot_general(                        # [W, S, L]
        qn, kcat, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    logits = jnp.where(kmcat[:, None, :] > 0, logits, -30000.0)
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    sums = jax.lax.dot_general(                          # per-group sums
        e, g, (((2,), (0,)), ((), ())), preferred_element_type=f32,
    )
    p = jnp.where(has_key, e / (sums + 1e-30), 0.0)
    out = jax.lax.dot_general(                           # [W, S, C]
        p.astype(bf), vcat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    return out.reshape(W * S, C)


def _head_mask_rows(H, C, dtype=jnp.float32):
    """[H, 1, C] per-head channel masks (lane-dim iota, no slicing)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, 1, C), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (H, 1, C), 0)
    D = C // H
    return ((lane // D) == hid).astype(dtype)


def _layer_body_sel(x64, kv64, sel_q, sel_k, qmask, kmask, pos_ref,
                    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                    bo_ref, tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref,
                    f2w_ref, f2b_ref, ln2s_ref, ln2b_ref,
                    nhead, tau_min, cross, S):
    """[TW, T64, C] window tiles -> [TW, T64, C] output; layer math runs on the
    S selected cells per window. Output = input + expanded delta, so
    non-selected cells pass through unchanged (callers delta-scatter)."""
    TW, T64, C = x64.shape
    dt = x64.dtype
    f32 = jnp.float32
    pos = pos_ref[:]                                    # [T64, C]

    cell = jax.lax.broadcasted_iota(jnp.int32, (TW, S, T64), 2)
    ohq = (cell == sel_q[..., None]).astype(dt)         # [TW, S, T64]
    pack = lambda oh, a: jax.lax.dot_general(
        oh, a, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)
    x16 = pack(ohq, x64)                                # [TW, S, C] f32
    posq = jax.lax.dot_general(
        ohq.reshape(TW * S, T64), pos.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(TW, S, C)
    if cross:
        ohk = (cell == sel_k[..., None]).astype(dt)
        kv16 = pack(ohk, kv64)
        posk = jax.lax.dot_general(
            ohk.reshape(TW * S, T64), pos.astype(dt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(TW, S, C)
    else:
        kv16, posk = x16, posq

    xp = (x16 + posq).reshape(TW * S, C).astype(dt)
    q = jnp.dot(xp, wq_ref[:], preferred_element_type=f32) + bq_ref[0]
    kvp = (kv16 + posk).reshape(TW * S, C).astype(dt)
    k = jnp.dot(kvp, wk_ref[:], preferred_element_type=f32) + bk_ref[0]
    v = jnp.dot(kv16.reshape(TW * S, C).astype(dt), wv_ref[:],
                preferred_element_type=f32) + bv_ref[0]
    mask_mat, mask_mat_t = _head_mask_mats(nhead, C)
    attn = _attention_core_packed(q, k, v, kmask, tau_ref[0, 0], nhead,
                                  tau_min, TW, S, C, mask_mat, mask_mat_t)
    attn = jnp.dot(attn.astype(dt), wo_ref[:],
                   preferred_element_type=f32) + bo_ref[0]
    qm = qmask[..., None] > 0                           # [TW, S, 1]
    h = _ln(x16 + jnp.where(qm, attn.reshape(TW, S, C), 0.0),
            ln1s_ref[0], ln1b_ref[0])
    h = jnp.where(qm, h, 0.0)
    ff = jnp.dot(h.reshape(TW * S, C).astype(dt), f1w_ref[:],
                 preferred_element_type=f32) + f1b_ref[0]
    ff = _gelu_exact(ff)
    ff = jnp.dot(ff.astype(dt), f2w_ref[:],
                 preferred_element_type=f32) + f2b_ref[0]
    out16 = _ln(h + ff.reshape(TW, S, C), ln2s_ref[0], ln2b_ref[0])
    delta = jnp.where(qm, out16 - x16, 0.0).astype(dt)
    # expand back: [TW, T64, S] x [TW, S, C] via ohq transpose-contraction
    delta64 = jax.lax.dot_general(
        ohq, delta, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    return x64.astype(f32) + delta64


def _kernel_sel(x_ref, kv_ref, selq_ref, selk_ref, qmask_ref, kmask_ref,
                pos_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref,
                f2w_ref, f2b_ref, ln2s_ref, ln2b_ref, o_ref,
                *, nhead, tau_min, cross, small_tokens):
    x = x_ref[:]
    kv = kv_ref[:] if cross else x
    out = _layer_body_sel(
        x, kv, selq_ref[:], selk_ref[:] if cross else selq_ref[:],
        qmask_ref[:], kmask_ref[:] if cross else qmask_ref[:], pos_ref,
        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
        tau_ref, ln1s_ref, ln1b_ref, f1w_ref, f1b_ref, f2w_ref, f2b_ref,
        ln2s_ref, ln2b_ref, nhead, tau_min, cross, small_tokens,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def reference_encoder_layer_sel(xw, kvw, sel_q, sel_k, qmask, kmask, pos,
                                wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s,
                                ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
                                nhead, tau_min, cross):
    """jnp reference of the sel variant (CPU path + VJP source). Selects the
    S cells, runs the standard layer math, expands the delta back onto the
    64-cell windows: out = xw + expand(delta)."""
    N, T64, C = xw.shape
    S = sel_q.shape[-1]
    f32 = jnp.float32
    take = lambda a, s: jnp.take_along_axis(a, s[..., None], axis=1)
    x16 = take(xw, sel_q).astype(f32)
    posq = pos.astype(f32)[sel_q]                       # [N, S, C]
    if cross:
        kv16 = take(kvw, sel_k).astype(f32)
        posk = pos.astype(f32)[sel_k]
    else:
        # self-attention: keys ARE the selected query cells — kvw/sel_k/kmask
        # arguments are ignored, exactly like the fused kernel
        kv16, posk, kmask = x16, posq, qmask
    q = (x16 + posq) @ wq.astype(f32) + bq
    k = (kv16 + posk) @ wk.astype(f32) + bk
    v = kv16 @ wv.astype(f32) + bv
    H, D = nhead, C // nhead
    qh = q.reshape(N, S, H, D)
    kh = k.reshape(N, S, H, D)
    vh = v.reshape(N, S, H, D)
    qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
    kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
    scale = 1.0 / jnp.maximum(tau[0], tau_min)
    logits = jnp.einsum('nthd,nshd->nhts', qh * scale, kh)
    logits = jnp.where(kmask[:, None, None, :] > 0, logits, -30000.0)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(jnp.any(kmask > 0, -1)[:, None, None, None], p, 0.0)
    attn = jnp.einsum('nhts,nshd->nthd', p, vh).reshape(N, S, C)
    attn = attn @ wo.astype(f32) + bo
    qm = qmask[..., None]
    h = _ln(x16 + jnp.where(qm > 0, attn, 0.0), ln1s, ln1b)
    h = jnp.where(qm > 0, h, 0.0)
    ff = jax.nn.gelu(h @ f1w.astype(f32) + f1b, approximate=False)
    ff = ff @ f2w.astype(f32) + f2b
    out16 = _ln(h + ff, ln2s, ln2b)
    delta = jnp.where(qm > 0, out16 - x16, 0.0)

    def expand(xw_n, sel_n, delta_n):
        return jnp.zeros((T64, C), f32).at[sel_n].add(delta_n)

    delta64 = jax.vmap(expand)(xw, sel_q, delta)
    return (xw.astype(f32) + delta64).astype(xw.dtype)


def _pallas_forward_sel(xw, kvw, sel_q, sel_k, qmask, kmask, pos, *params,
                        nhead, tau_min, cross):
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    N, T64, C = xw.shape
    S = sel_q.shape[-1]
    F = f1w.shape[1]
    # TW is pinned to TILE_WINDOWS=16: S=48 at TW=32 would exceed the 16M
    # scoped-VMEM budget, and occ_compact.round_cap() pads caps to multiples
    # of 16 to match this tile. Revisit both together if TILE_WINDOWS moves.
    assert TILE_WINDOWS == 16, 'retune sel-kernel tiling with round_cap()'
    TW = TILE_WINDOWS
    padded = ((N + TW - 1) // TW) * TW
    if padded != N:
        padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
        xw, kvw, qmask, kmask = (padz(xw), padz(kvw), padz(qmask), padz(kmask))
        sel_q, sel_k = padz(sel_q), padz(sel_k)
    dt = xw.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    vec_specs = [
        pl.BlockSpec((TW, T64, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, T64, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TW, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T64, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    param_specs = [
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    ]
    kernel = functools.partial(_kernel_sel, nhead=nhead, tau_min=tau_min,
                               cross=cross, small_tokens=S)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, T64, C), xw.dtype),
        grid_spec=pl.GridSpec(
            grid=(padded // TW,),
            in_specs=vec_specs + param_specs,
            out_specs=pl.BlockSpec((TW, T64, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xw, kvw, sel_q, sel_k, qmask.astype(jnp.float32),
      kmask.astype(jnp.float32), pos,
      mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
      tau.reshape(1, 1).astype(jnp.float32), row(ln1s), row(ln1b),
      mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s), row(ln2b))
    return out[:N]


def _forward_sel_dispatch(xw, kvw, sel_q, sel_k, qmask, kmask, pos, *params,
                          nhead, tau_min, cross):
    C = xw.shape[-1]
    S = sel_q.shape[-1]
    pallas_ok = C % 128 == 0 and S % 8 == 0
    if pallas_ok and (_INTERPRET or jax.default_backend() == 'tpu'):
        return _pallas_forward_sel(
            xw, kvw, sel_q, sel_k, qmask, kmask, pos, *params,
            nhead=nhead, tau_min=tau_min, cross=cross,
        )
    return reference_encoder_layer_sel(
        xw, kvw, sel_q, sel_k, qmask, kmask, pos, *params,
        nhead=nhead, tau_min=tau_min, cross=cross,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(24, 25, 26))
def fused_encoder_layer_sel(xw, kvw, sel_q, sel_k, qmask, kmask, pos,
                            wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b,
                            f1w, f1b, f2w, f2b, ln2s, ln2b,
                            nhead: int, tau_min: float, cross: bool):
    """Token-bucketed fused layer: xw/kvw [N, T64, C] window tiles; sel_q/sel_k
    [N, S] int32 in-window cell ids; qmask/kmask [N, S]. Returns xw + the
    layer delta expanded onto the selected cells."""
    return _forward_sel_dispatch(
        xw, kvw, sel_q, sel_k, qmask, kmask, pos, wq, bq, wk, bk, wv, bv,
        wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
        nhead=nhead, tau_min=tau_min, cross=cross,
    )


def _fwd_sel(xw, kvw, sel_q, sel_k, qmask, kmask, pos, wq, bq, wk, bk, wv,
             bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
             nhead, tau_min, cross):
    out = _forward_sel_dispatch(
        xw, kvw, sel_q, sel_k, qmask, kmask, pos, wq, bq, wk, bk, wv, bv,
        wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
        nhead=nhead, tau_min=tau_min, cross=cross,
    )
    return out, (xw, kvw, sel_q, sel_k, qmask, kmask, pos, wq, bq, wk, bk,
                 wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s,
                 ln2b)


def _bwd_sel(nhead, tau_min, cross, residuals, g):
    """Backward dispatch: fused Pallas kernel on TPU, chunked XLA recompute
    over the jnp sel reference elsewhere."""
    (xw, kvw, sel_q, sel_k, qmask, kmask, pos) = residuals[:7]
    T64, C = xw.shape[1], xw.shape[2]
    S = sel_q.shape[-1]
    pallas_ok = C % 128 == 0 and S % 8 == 0 and T64 % 8 == 0
    if USE_PALLAS_BWD and pallas_ok and (
        _INTERPRET or jax.default_backend() == 'tpu'
    ):
        outs = _pallas_backward_sel(
            xw, residuals[1], sel_q, residuals[3], qmask, residuals[5], pos,
            tuple(residuals[7:]), g, nhead=nhead, tau_min=tau_min,
            cross=cross,
        )
        zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return (outs[0], outs[1], zi(sel_q), zi(residuals[3]),
                jnp.zeros_like(qmask), jnp.zeros_like(residuals[5]),
                jnp.zeros_like(pos)) + outs[2:]
    return _bwd_sel_recompute(nhead, tau_min, cross, residuals, g)


def _bwd_sel_recompute(nhead, tau_min, cross, residuals, g):
    """Chunked XLA-recompute backward over the jnp sel reference (CPU path +
    fallback)."""
    (xw, kvw, sel_q, sel_k, qmask, kmask, pos) = residuals[:7]
    weights = residuals[7:]
    N = xw.shape[0]
    CH = BWD_CHUNK
    padded = ((N + CH - 1) // CH) * CH
    padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
    xs = tuple(
        a.reshape(padded // CH, CH, *a.shape[1:])
        for a in (padz(xw), padz(kvw), padz(sel_q), padz(sel_k), padz(qmask),
                  padz(kmask), padz(g))
    )

    def chunk_grad(carry, chunk):
        cxw, ckvw, csq, csk, cqm, ckm, cg = chunk

        def f(cx, ckv, *w):
            return reference_encoder_layer_sel(
                cx, ckv, csq, csk, cqm, ckm, pos, *w, nhead=nhead,
                tau_min=tau_min, cross=cross,
            )

        _, vjp = jax.vjp(f, cxw, ckvw, *weights)
        grads = vjp(cg)
        carry = jax.tree.map(jnp.add, carry, tuple(grads[2:]))
        return carry, (grads[0], grads[1])

    w_zero = tuple(jnp.zeros_like(w) for w in weights)
    gw_sum, (gx_all, gkv_all) = jax.lax.scan(chunk_grad, w_zero, xs)
    gx = gx_all.reshape(padded, *xw.shape[1:])[:N]
    gkv = (gkv_all.reshape(padded, *kvw.shape[1:])[:N] if cross
           else jnp.zeros_like(kvw))
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (gx, gkv, zi(sel_q), zi(sel_k), jnp.zeros_like(qmask),
            jnp.zeros_like(kmask), jnp.zeros_like(pos)) + gw_sum


fused_encoder_layer_sel.defvjp(_fwd_sel, _bwd_sel)


def _bwd_kernel_sel(x_ref, kv_ref, selq_ref, selk_ref, qmask_ref, kmask_ref,
                    pos_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    wo_ref, bo_ref, tau_ref, ln1s_ref, ln1b_ref, f1w_ref,
                    f1b_ref, f2w_ref, f2b_ref, ln2s_ref, ln2b_ref, g_ref,
                    dx_ref, dkv_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dwo_ref, dbo_ref, dtau_ref, dln1s_ref,
                    dln1b_ref, df1w_ref, df1b_ref, df2w_ref, df2b_ref,
                    dln2s_ref, dln2b_ref,
                    *, nhead, tau_min, cross, small_tokens):
    """Fused backward of the sel (token-bucketed) layer: recomputes the
    packed-head forward in VMEM and emits dx/dkv + weight grads."""
    TW, T64, C = x_ref.shape
    S = small_tokens
    H = nhead
    L = H * S
    f32 = jnp.float32
    bf = jnp.bfloat16

    def dotb(a, b, dims=None):
        a = a.astype(bf)
        b = b.astype(bf)
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=f32)
        return jax.lax.dot_general(a, b, dims, preferred_element_type=f32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref, dtau_ref, dln1s_ref, dln1b_ref,
                  df1w_ref, df1b_ref, df2w_ref, df2b_ref, dln2s_ref,
                  dln2b_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    x64 = x_ref[:]
    kv64 = kv_ref[:] if cross else x64
    pos = pos_ref[:]
    dtp = x64.dtype
    sel_q = selq_ref[:]
    sel_k = selk_ref[:] if cross else sel_q
    qm = qmask_ref[:][..., None] > 0                     # [TW, S, 1]
    km = kmask_ref[:] if cross else qmask_ref[:]         # [TW, S]
    g64 = g_ref[:].astype(f32)
    tau = tau_ref[0, 0]
    scale = 1.0 / jnp.maximum(tau, tau_min)
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]

    # ---- forward recompute ----
    cell = jax.lax.broadcasted_iota(jnp.int32, (TW, S, T64), 2)
    ohq = (cell == sel_q[..., None]).astype(dtp)
    pack = lambda oh, a: jax.lax.dot_general(
        oh, a, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32)
    x16 = pack(ohq, x64)
    posq = jax.lax.dot_general(
        ohq.reshape(TW * S, T64), pos.astype(dtp), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(TW, S, C)
    if cross:
        ohk = (cell == sel_k[..., None]).astype(dtp)
        kv16 = pack(ohk, kv64)
        posk = jax.lax.dot_general(
            ohk.reshape(TW * S, T64), pos.astype(dtp),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).reshape(TW, S, C)
    else:
        ohk, kv16, posk = ohq, x16, posq

    xp = (x16 + posq).reshape(TW * S, C)
    q = dotb(xp, wq_ref[:]) + bq_ref[0]
    kvp = (kv16 + posk).reshape(TW * S, C)
    k = dotb(kvp, wk_ref[:]) + bk_ref[0]
    v = dotb(kv16.reshape(TW * S, C), wv_ref[:]) + bv_ref[0]
    mask_mat, mask_mat_t = _head_mask_mats(H, C)
    q3 = q.reshape(TW, S, C)
    k3 = k.reshape(TW, S, C)
    v3 = v.reshape(TW, S, C)
    qn, rql = _cosine_normalize(q3, mask_mat, mask_mat_t, return_r=True)
    kn, rkl = _cosine_normalize(k3, mask_mat, mask_mat_t, return_r=True)
    hmask = _head_mask_rows(H, C)                        # [H, 1, C]
    kcat = (kn[:, None] * hmask[None]).reshape(TW, L, C)
    vcat = (v3[:, None] * hmask[None]).reshape(TW, L, C)
    tmat, gmat = _group_matrices(H, S)
    kmcat = jax.lax.dot_general(km, tmat, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dots = dotb(qn, kcat, (((2,), (2,)), ((0,), (0,))))  # [TW, S, L]
    logits = jnp.where(kmcat[:, None, :] > 0, dots * scale, -30000.0)
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    sums = jax.lax.dot_general(e, gmat, (((2,), (0,)), ((), ())),
                               preferred_element_type=f32)
    p = jnp.where(has_key, e / (sums + 1e-30), 0.0)
    av = dotb(p, vcat, (((2,), (1,)), ((0,), (0,))))      # [TW, S, C]
    attn = dotb(av.reshape(TW * S, C), wo_ref[:]) + bo_ref[0]
    z1 = x16 + jnp.where(qm, attn.reshape(TW, S, C), 0.0)
    x1hat, inv1 = _ln_fwd_stats(z1)
    h1 = jnp.where(qm, x1hat * ln1s_ref[0] + ln1b_ref[0], 0.0)
    ff1 = dotb(h1.reshape(TW * S, C), f1w_ref[:]) + f1b_ref[0]
    gg = _gelu_exact(ff1)
    ff2 = dotb(gg, f2w_ref[:]) + f2b_ref[0]
    z2 = h1 + ff2.reshape(TW, S, C)
    x2hat, inv2 = _ln_fwd_stats(z2)

    # ---- backward ----
    # out64 = x64 + E(qm * (out16 - x16)); dd = per-window gathered g
    dd = pack(ohq, g64)                                  # [TW, S, C]
    g_out = jnp.where(qm, dd, 0.0)
    dln2s_ref[0] += jnp.sum((g_out * x2hat).reshape(TW * S, C), axis=0)
    dln2b_ref[0] += jnp.sum(g_out.reshape(TW * S, C), axis=0)
    dz2 = _ln_bwd(g_out, x2hat, inv2, ln2s_ref[0])

    dff2 = dz2.reshape(TW * S, C)
    df2w_ref[:] += dotb(gg.T, dff2)
    df2b_ref[0] += jnp.sum(dff2, axis=0)
    dgg = dotb(dff2, f2w_ref[:].T)
    dff1 = dgg * _gelu_grad(ff1)
    h1f = h1.reshape(TW * S, C)
    df1w_ref[:] += dotb(h1f.T, dff1)
    df1b_ref[0] += jnp.sum(dff1, axis=0)
    dh1 = dz2 + dotb(dff1, f1w_ref[:].T).reshape(TW, S, C)
    dh1 = jnp.where(qm, dh1, 0.0)

    dln1s_ref[0] += jnp.sum((dh1 * x1hat).reshape(TW * S, C), axis=0)
    dln1b_ref[0] += jnp.sum(dh1.reshape(TW * S, C), axis=0)
    dz1 = _ln_bwd(dh1, x1hat, inv1, ln1s_ref[0])

    dx16 = dz1 - jnp.where(qm, dd, 0.0)                  # -x16 term of delta
    dattn = jnp.where(qm, dz1, 0.0).reshape(TW * S, C)
    dwo_ref[:] += dotb(av.reshape(TW * S, C).T, dattn)
    dbo_ref[0] += jnp.sum(dattn, axis=0)
    dav = dotb(dattn, wo_ref[:].T).reshape(TW, S, C)

    dp = dotb(dav, vcat, (((2,), (2,)), ((0,), (0,))))   # [TW, S, L]
    dvcat = dotb(p, dav, (((1,), (1,)), ((0,), (0,))))   # [TW, L, C]
    dv3 = jnp.sum(dvcat.reshape(TW, H, S, C) * hmask[None], axis=1)
    # group softmax bwd: dL = p * (dp - groupsum(dp * p))
    t = dp * p
    tg = jax.lax.dot_general(t, gmat, (((2,), (0,)), ((), ())),
                             preferred_element_type=f32)
    dlog = p * (dp - tg)
    ddots = dlog * scale
    dtau_acc = jnp.sum(dlog * dots)
    dqn = dotb(ddots, kcat, (((2,), (1,)), ((0,), (0,))))   # [TW, S, C]
    dkcat = dotb(ddots, qn, (((1,), (1,)), ((0,), (0,))))   # [TW, L, C]
    dkn = jnp.sum(dkcat.reshape(TW, H, S, C) * hmask[None], axis=1)
    dtau_ref[:] += jnp.where(tau > tau_min,
                             -dtau_acc / (tau * tau), 0.0).reshape(1, 1)

    # cosine-norm backward (per-head lane sums)
    dq3 = rql * (dqn - qn * _headwise_lane_sum(dqn * qn, mask_mat,
                                               mask_mat_t))
    dk3 = rkl * (dkn - kn * _headwise_lane_sum(dkn * kn, mask_mat,
                                               mask_mat_t))
    dq = dq3.reshape(TW * S, C)
    dk = dk3.reshape(TW * S, C)
    dv = dv3.reshape(TW * S, C)

    dwv_ref[:] += dotb(kv16.reshape(TW * S, C).T, dv)
    dbv_ref[0] += jnp.sum(dv, axis=0)
    dkv16 = dotb(dv, wv_ref[:].T).reshape(TW, S, C)

    dwq_ref[:] += dotb(xp.T, dq)
    dbq_ref[0] += jnp.sum(dq, axis=0)
    dxp = dotb(dq, wq_ref[:].T).reshape(TW, S, C)

    dwk_ref[:] += dotb(kvp.T, dk)
    dbk_ref[0] += jnp.sum(dk, axis=0)
    dkvp = dotb(dk, wk_ref[:].T).reshape(TW, S, C)

    expand = lambda oh, a: jax.lax.dot_general(
        oh, a.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32)
    if cross:
        dx16 = dx16 + dxp
        dkv16 = dkv16 + dkvp
        dx_ref[:] = (g64 + expand(ohq, dx16)).astype(dx_ref.dtype)
        dkv_ref[:] = expand(ohk, dkv16).astype(dkv_ref.dtype)
    else:
        dx16 = dx16 + dxp + dkvp + dkv16
        dx_ref[:] = (g64 + expand(ohq, dx16)).astype(dx_ref.dtype)
        dkv_ref[:] = jnp.zeros(dkv_ref.shape, dkv_ref.dtype)


def _pallas_backward_sel(xw, kvw, sel_q, sel_k, qmask, kmask, pos, params, g,
                         *, nhead, tau_min, cross):
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    N, T64, C = xw.shape
    S = sel_q.shape[-1]
    F = f1w.shape[1]
    TW = BWD_TILE_WINDOWS
    padded = ((N + TW - 1) // TW) * TW
    if padded != N:
        padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
        xw, kvw, qmask, kmask, g = (padz(xw), padz(kvw), padz(qmask),
                                    padz(kmask), padz(g))
        sel_q, sel_k = padz(sel_q), padz(sel_k)
    dt = xw.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    tile3 = pl.BlockSpec((TW, T64, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((TW, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        tile3, tile3, tile2, tile2, tile2, tile2, wspec((T64, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)), wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
        tile3,  # g
    ]
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((padded, T64, C), f32),   # dx
        jax.ShapeDtypeStruct((padded, T64, C), f32),   # dkv
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, F), f32), jax.ShapeDtypeStruct((1, F), f32),
        jax.ShapeDtypeStruct((F, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
    )
    out_specs = (
        tile3, tile3,
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    )
    kernel = functools.partial(_bwd_kernel_sel, nhead=nhead, tau_min=tau_min,
                               cross=cross, small_tokens=S)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pl.GridSpec(
            grid=(padded // TW,),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xw, kvw, sel_q, sel_k, qmask.astype(jnp.float32),
      kmask.astype(jnp.float32), pos,
      mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
      tau.reshape(1, 1).astype(jnp.float32), row(ln1s), row(ln1b),
      mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s), row(ln2b), g)
    (dx, dkv, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, dtau, dln1s, dln1b,
     df1w, df1b, df2w, df2b, dln2s, dln2b) = outs
    shp = lambda gr, w_: gr.reshape(w_.shape).astype(w_.dtype)
    return (
        dx[:N].astype(xw.dtype), dkv[:N].astype(kvw.dtype),
        shp(dwq, wq), shp(dbq, bq), shp(dwk, wk), shp(dbk, bk),
        shp(dwv, wv), shp(dbv, bv), shp(dwo, wo), shp(dbo, bo),
        shp(dtau, tau), shp(dln1s, ln1s), shp(dln1b, ln1b),
        shp(df1w, f1w), shp(df1b, f1b), shp(df2w, f2w), shp(df2b, f2b),
        shp(dln2s, ln2s), shp(dln2b, ln2b),
    )


# ---------------------------------------------------------------------------
# Grid-native entry point: no HBM window_view/unview
# ---------------------------------------------------------------------------

GRID_TILE_WINDOWS = 16  # windows per kernel strip along x


def _grid_forward(xg, kvg, qocc, kocc, pos, *params, nhead, tau_min, cross,
                  window, shift):
    from .dense_windows import window_geometry

    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    B, H, Wd, C = xg.shape
    F = f1w.shape[1]
    w = window
    nwy, nwx, Hp, Wp = window_geometry((H, Wd), w)
    off = w // 2 if shift else w
    TWX = GRID_TILE_WINDOWS
    nwx_p = ((nwx + TWX - 1) // TWX) * TWX
    Wp_blk = nwx_p * w
    pad4 = lambda a: jnp.pad(
        a, ((0, 0), (off, Hp - H - off), (off, Wp_blk - Wd - off), (0, 0)))
    occ8 = lambda o: jnp.broadcast_to(
        o[..., None].astype(jnp.float32), (*o.shape, 8))
    xg_p = pad4(xg)
    kvg_p = pad4(kvg) if cross else xg_p
    qocc_p = pad4(occ8(qocc))
    kocc_p = pad4(occ8(kocc)) if cross else qocc_p

    dt = xg.dtype
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    strip4 = pl.BlockSpec((1, w, w * TWX, C), lambda b, y, xt: (b, y, xt, 0),
                          memory_space=pltpu.VMEM)
    strip_occ = pl.BlockSpec((1, w, w * TWX, 8),
                             lambda b, y, xt: (b, y, xt, 0),
                             memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda b, y, xt: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        strip4, strip4, strip_occ, strip_occ, wspec((w * w, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)), wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    ]
    kernel = functools.partial(_grid_kernel, nhead=nhead, tau_min=tau_min,
                               cross=cross, window=w, twx=TWX)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp_blk, C), xg.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwy, nwx_p // TWX),
            in_specs=in_specs,
            out_specs=strip4,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xg_p, kvg_p, qocc_p, kocc_p, pos,
      mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo), row(bo),
      tau.reshape(1, 1).astype(jnp.float32), row(ln1s), row(ln1b),
      mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s), row(ln2b))
    return out[:, off:off + H, off:off + Wd, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(22, 23, 24, 25, 26))
def fused_encoder_layer_grid(xg, kvg, qocc, kocc, pos, wq, bq, wk, bk, wv,
                             bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w,
                             f2b, ln2s, ln2b, nhead: int, tau_min: float,
                             cross: bool, window: int, shift: bool):
    """Fused encoder layer over the dense BEV grid: xg/kvg [B, H, W, C],
    qocc/kocc [B, H, W] bool — window partition, attention+LN+FFN+LN and the
    inverse partition all happen inside one kernel."""
    return _grid_forward(xg, kvg, qocc, kocc, pos,
                         wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b,
                         f1w, f1b, f2w, f2b, ln2s, ln2b,
                         nhead=nhead, tau_min=tau_min, cross=cross,
                         window=window, shift=shift)


def _grid_fwd_vjp(xg, kvg, qocc, kocc, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                  tau, ln1s, ln1b, f1w, f1b, f2w, f2b, ln2s, ln2b,
                  nhead, tau_min, cross, window, shift):
    params = (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b,
              f2w, f2b, ln2s, ln2b)
    out = _grid_forward(xg, kvg, qocc, kocc, pos, *params, nhead=nhead,
                        tau_min=tau_min, cross=cross, window=window,
                        shift=shift)
    return out, (xg, kvg, qocc, kocc, pos) + params


def _grid_bwd(nhead, tau_min, cross, window, shift, residuals, g):
    """Backward via the windowed kernels: pay the XLA window_view transposes
    only on the training path."""
    from .dense_windows import window_view, window_unview

    xg, kvg, qocc, kocc, pos = residuals[:5]
    params = residuals[5:]
    B, H, Wd, C = xg.shape
    flat = lambda a: a.reshape(-1, *a.shape[2:])
    xw = flat(window_view(xg, window, shift))
    kvw = flat(window_view(kvg, window, shift)) if cross else xw
    qm = flat(window_view(qocc[..., None].astype(jnp.float32), window,
                          shift)[..., 0])
    km = (flat(window_view(kocc[..., None].astype(jnp.float32), window,
                           shift)[..., 0]) if cross else qm)
    gw = flat(window_view(g, window, shift))
    outs = _bwd(nhead, tau_min, cross,
                (xw, kvw, qm, km, pos) + tuple(params), gw)
    dxw, dkvw = outs[0], outs[1]
    NW = dxw.shape[0] // B
    unflat = lambda a: a.reshape(B, NW, *a.shape[1:])
    dxg = window_unview(unflat(dxw), (H, Wd), window, shift)
    dkvg = (window_unview(unflat(dkvw), (H, Wd), window, shift)
            if cross else jnp.zeros_like(kvg))
    return (dxg.astype(xg.dtype), dkvg.astype(kvg.dtype),
            jnp.zeros_like(qocc), jnp.zeros_like(kocc), outs[4]) + outs[5:]


fused_encoder_layer_grid.defvjp(_grid_fwd_vjp, _grid_bwd)


def reference_encoder_layer_grid(xg, kvg, qocc, kocc, pos, *params, nhead,
                                 tau_min, cross, window, shift):
    """jnp twin of the grid-native kernel (CPU path + tests)."""
    from .dense_windows import window_view, window_unview

    B, H, Wd, C = xg.shape
    flat = lambda a: a.reshape(-1, *a.shape[2:])
    xw = flat(window_view(xg, window, shift))
    kvw = flat(window_view(kvg, window, shift)) if cross else xw
    qm = flat(window_view(qocc[..., None].astype(jnp.float32), window,
                          shift)[..., 0])
    km = (flat(window_view(kocc[..., None].astype(jnp.float32), window,
                           shift)[..., 0]) if cross else qm)
    out = reference_encoder_layer(xw, kvw, qm, km, pos, *params, nhead=nhead,
                                  tau_min=tau_min, cross=cross)
    NW = out.shape[0] // B
    return window_unview(out.reshape(B, NW, *out.shape[1:]), (H, Wd), window,
                         shift)


# ---------------------------------------------------------------------------
# Combined-bucket ROW kernels (serving path).
#
# The per-layer compact execution used to launch gather + kernel + scatter
# per bucket (9-12 pallas_calls/layer at ~tens of µs fixed cost each — the
# dominant cost once the math itself is bucketed). The combined path gathers
# ALL buckets' windows with ONE call (concatenated plan, occ_compact.py
# cat_idx), then each bucket's kernel updates ITS row range of the shared
# [B, total, T, C] tensor IN PLACE (input_output_aliases; rows outside the
# grid keep the aliased input), and ONE scatter writes everything back:
# 5 launches/layer (6 cross) instead of 9 (12).
#
# Forward-only (inference/serving); training uses the per-bucket custom_vjp
# path (models/sst.py gates on `serving`).
# ---------------------------------------------------------------------------


def _row_param_ops(params, dt):
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    C = wq.shape[0]
    F = f1w.shape[1]
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    specs = [
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    ]
    ops = (mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo),
           row(bo), tau.reshape(1, 1).astype(jnp.float32), row(ln1s),
           row(ln1b), mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s),
           row(ln2b))
    return specs, ops


def _kernel_rows_full(*refs, nhead, tau_min, cross):
    if cross:
        (x_ref, kv_ref, qm_ref, km_ref, pos_ref), rest = refs[:5], refs[5:]
    else:
        (x_ref, qm_ref, pos_ref), rest = refs[:3], refs[3:]
        kv_ref, km_ref = x_ref, qm_ref
    o_ref = rest[-1]
    p = rest[:-1]
    x = x_ref[0]
    kv = kv_ref[0] if cross else x
    out = _layer_body(x, kv, qm_ref[0], km_ref[0] if cross else qm_ref[0],
                      pos_ref, *p, nhead, tau_min, cross)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_rows_sel(*refs, nhead, tau_min, cross, small_tokens):
    if cross:
        (x_ref, kv_ref, selq_ref, selk_ref, qm_ref, km_ref,
         pos_ref), rest = refs[:7], refs[7:]
    else:
        (x_ref, selq_ref, qm_ref, pos_ref), rest = refs[:4], refs[4:]
        kv_ref, selk_ref, km_ref = x_ref, selq_ref, qm_ref
    o_ref = rest[-1]
    p = rest[:-1]
    x = x_ref[0]
    kv = kv_ref[0] if cross else x
    out = _layer_body_sel(
        x, kv, selq_ref[0], selk_ref[0] if cross else selq_ref[0],
        qm_ref[0], km_ref[0] if cross else qm_ref[0], pos_ref, *p,
        nhead, tau_min, cross, small_tokens,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def encoder_layer_rows_full(xw_all, kv_all, qmask, kmask, pos, *params,
                            nhead, tau_min, cross, row_lo: int):
    """Fused full-window layer over rows [row_lo, row_lo+cap) of
    ``xw_all`` [B, total, T, C], updated IN PLACE (aliased); other rows pass
    through. ``qmask``/``kmask`` [B, cap, T]. TPU/interpret only."""
    B, total, T, C = xw_all.shape
    cap = qmask.shape[1]
    TW = TILE_WINDOWS
    assert row_lo % TW == 0 and cap % TW == 0 and row_lo + cap <= total
    OFF = row_lo // TW
    dt = xw_all.dtype
    xspec = pl.BlockSpec((1, TW, T, C), lambda b, i: (b, OFF + i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, TW, T), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((T, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM)
    pspecs, pops = _row_param_ops(params, dt)
    if cross:
        in_specs = [xspec, xspec, mspec, mspec, pspec] + pspecs
        operands = (xw_all, kv_all, qmask.astype(jnp.float32),
                    kmask.astype(jnp.float32), pos) + pops
    else:
        in_specs = [xspec, mspec, pspec] + pspecs
        operands = (xw_all, qmask.astype(jnp.float32), pos) + pops
    kernel = functools.partial(_kernel_rows_full, nhead=nhead,
                               tau_min=tau_min, cross=cross)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xw_all.shape, xw_all.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, cap // TW),
            in_specs=in_specs,
            out_specs=xspec,
        ),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(*operands)


def encoder_layer_rows_sel(xw_all, kv_all, sel_q, sel_k, qmask, kmask, pos,
                           *params, nhead, tau_min, cross, row_lo: int):
    """Packed (token-bucketed) layer over rows [row_lo, row_lo+cap) of
    ``xw_all``, updated in place. ``sel_q``/``qmask`` [B, cap, S]."""
    B, total, T, C = xw_all.shape
    cap, S = qmask.shape[1], qmask.shape[2]
    # pinned to 16 — see _pallas_forward_sel for the VMEM/round_cap coupling
    assert TILE_WINDOWS == 16, 'retune sel-kernel tiling with round_cap()'
    TW = TILE_WINDOWS
    assert row_lo % TW == 0 and cap % TW == 0 and row_lo + cap <= total
    OFF = row_lo // TW
    dt = xw_all.dtype
    xspec = pl.BlockSpec((1, TW, T, C), lambda b, i: (b, OFF + i, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, TW, S), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((T, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM)
    pspecs, pops = _row_param_ops(params, dt)
    if cross:
        in_specs = [xspec, xspec, sspec, sspec, sspec, sspec, pspec] + pspecs
        operands = (xw_all, kv_all, sel_q, sel_k,
                    qmask.astype(jnp.float32), kmask.astype(jnp.float32),
                    pos) + pops
    else:
        in_specs = [xspec, sspec, sspec, pspec] + pspecs
        operands = (xw_all, sel_q, qmask.astype(jnp.float32), pos) + pops
    kernel = functools.partial(_kernel_rows_sel, nhead=nhead,
                               tau_min=tau_min, cross=cross, small_tokens=S)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xw_all.shape, xw_all.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, cap // TW),
            in_specs=in_specs,
            out_specs=xspec,
        ),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(*operands)


# ---------------------------------------------------------------------------
# Fused in-place layer kernels (serving path, round 5).
#
# The combined-bucket path above still pays one gather + one scatter per
# layer — 6 HBM passes over the window tensor (grid blocks -> xw_all ->
# kernels -> xw_all -> grid blocks) and measured ~1.24 ms/layer at stage-1
# caps B=2 (tools/profile_wca_split.py), which dominates a stage whose math
# is ~0.3 ms. These kernels fuse DMA-in + layer + DMA-out into ONE
# pallas_call per bucket: each grid step copies TILE_WINDOWS windows from
# the padded grid (HBM, aliased in/out) into VMEM scratch, runs the layer
# body on the tile, and copies the results back — 2 HBM passes over only the
# touched blocks, no intermediate window tensor, 3 launches/layer (small +
# mid + full) instead of 5-6.
#
# Forward-only (no custom_vjp; the output aliases the input). models/sst.py
# gates on `serving` exactly like the combined path.
# ---------------------------------------------------------------------------


def _fused_param_specs(params, dt):
    """_row_param_ops with scalar-prefetch index maps (wy/wx refs appended)."""
    (wq, bq, wk, bk, wv, bv, wo, bo, tau, ln1s, ln1b, f1w, f1b, f2w, f2b,
     ln2s, ln2b) = params
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    mat = lambda a: a.astype(dt)
    C = wq.shape[0]
    F = f1w.shape[1]
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda b, i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    specs = [
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((C, C)), wspec((1, C)), wspec((C, C)), wspec((1, C)),
        wspec((1, 1)),
        wspec((1, C)), wspec((1, C)),
        wspec((C, F)), wspec((1, F)), wspec((F, C)), wspec((1, C)),
        wspec((1, C)), wspec((1, C)),
    ]
    ops = (mat(wq), row(bq), mat(wk), row(bk), mat(wv), row(bv), mat(wo),
           row(bo), tau.reshape(1, 1).astype(jnp.float32), row(ln1s),
           row(ln1b), mat(f1w), row(f1b), mat(f2w), row(f2b), row(ln2s),
           row(ln2b))
    return specs, ops


def _tile_dma_in(src_any, wy_ref, wx_ref, tile, sems, b, base, w, tw):
    dmas = []
    for k in range(tw):
        wy = wy_ref[b, base + k]
        wx = wx_ref[b, base + k]
        dma = pltpu.make_async_copy(
            src_any.at[b, pl.ds(wy * w, w), pl.ds(wx * w, w), :],
            tile.at[k], sems.at[k],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def _tile_dma_out(tile, wy_ref, wx_ref, dst_any, sems, b, base, w, tw):
    dmas = []
    for k in range(tw):
        wy = wy_ref[b, base + k]
        wx = wx_ref[b, base + k]
        dma = pltpu.make_async_copy(
            tile.at[k],
            dst_any.at[b, pl.ds(wy * w, w), pl.ds(wx * w, w), :],
            sems.at[k],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def _kernel_fused_full(*refs, nhead, tau_min, cross, w, tw):
    if cross:
        (wy_ref, wx_ref, x_any, kv_any, qm_ref, km_ref,
         pos_ref), rest = refs[:7], refs[7:]
    else:
        (wy_ref, wx_ref, x_any, qm_ref, pos_ref), rest = refs[:5], refs[5:]
    o_any = rest[17]
    p = rest[:17]
    if cross:
        x_tile, kv_tile, o_tile, sems, ksems = rest[18:]
    else:
        x_tile, o_tile, sems = rest[18:]
    b = pl.program_id(0)
    base = pl.program_id(1) * tw
    C = x_tile.shape[-1]
    T = w * w
    _tile_dma_in(x_any, wy_ref, wx_ref, x_tile, sems, b, base, w, tw)
    if cross:
        _tile_dma_in(kv_any, wy_ref, wx_ref, kv_tile, ksems, b, base, w, tw)
    x = x_tile[:].reshape(tw, T, C)
    kv = kv_tile[:].reshape(tw, T, C) if cross else x
    out = _layer_body(
        x, kv, qm_ref[0], km_ref[0] if cross else qm_ref[0], pos_ref, *p,
        nhead, tau_min, cross,
    )
    o_tile[:] = out.reshape(tw, w, w, C).astype(o_tile.dtype)
    _tile_dma_out(o_tile, wy_ref, wx_ref, o_any, sems, b, base, w, tw)


def _kernel_fused_sel(*refs, nhead, tau_min, cross, w, tw, small_tokens):
    if cross:
        (wy_ref, wx_ref, x_any, kv_any, selq_ref, selk_ref, qm_ref, km_ref,
         pos_ref), rest = refs[:9], refs[9:]
    else:
        (wy_ref, wx_ref, x_any, selq_ref, qm_ref,
         pos_ref), rest = refs[:6], refs[6:]
    o_any = rest[17]
    p = rest[:17]
    if cross:
        x_tile, kv_tile, o_tile, sems, ksems = rest[18:]
    else:
        x_tile, o_tile, sems = rest[18:]
    b = pl.program_id(0)
    base = pl.program_id(1) * tw
    C = x_tile.shape[-1]
    T = w * w
    _tile_dma_in(x_any, wy_ref, wx_ref, x_tile, sems, b, base, w, tw)
    if cross:
        _tile_dma_in(kv_any, wy_ref, wx_ref, kv_tile, ksems, b, base, w, tw)
    x = x_tile[:].reshape(tw, T, C)
    kv = kv_tile[:].reshape(tw, T, C) if cross else x
    out = _layer_body_sel(
        x, kv, selq_ref[0], selk_ref[0] if cross else selq_ref[0],
        qm_ref[0], km_ref[0] if cross else qm_ref[0], pos_ref, *p,
        nhead, tau_min, cross, small_tokens,
    )
    o_tile[:] = out.reshape(tw, w, w, C).astype(o_tile.dtype)
    _tile_dma_out(o_tile, wy_ref, wx_ref, o_any, sems, b, base, w, tw)


def encoder_layer_fused_inplace(xp, kvp, ci, pos, *params, nhead, tau_min,
                                cross, window, sel: bool):
    """Run one encoder layer over the windows of one bucket plan DIRECTLY on
    the padded grid ``xp`` [B, Hp + w, Wp, C] (updated in place via aliasing;
    unvisited windows keep their content). ``ci`` is a CompactInfo
    (``sel=False``: full 64-token windows) or SmallCompactInfo (``sel=True``:
    packed S-token math). TPU/interpret only — forward-only."""
    B = xp.shape[0]
    w = window
    T = w * w
    C = xp.shape[-1]
    cap = ci.idx.shape[1]
    tw = FUSED_TW if cap % FUSED_TW == 0 else TILE_WINDOWS
    assert cap % tw == 0, (cap, tw)
    dt = xp.dtype
    wy, wx = ci.idx[..., 0], ci.idx[..., 1]
    pspecs, pops = _fused_param_specs(params, dt)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    pos_spec = pl.BlockSpec((T, C), lambda b, i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((tw, w, w, C), dt),
        pltpu.VMEM((tw, w, w, C), dt),
        pltpu.SemaphoreType.DMA((tw,)),
    ]
    if cross:
        scratch.insert(1, pltpu.VMEM((tw, w, w, C), dt))
        scratch.append(pltpu.SemaphoreType.DMA((tw,)))
    if sel:
        S = ci.sel.shape[-1]
        sspec = pl.BlockSpec((1, tw, S), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _kernel_fused_sel, nhead=nhead, tau_min=tau_min, cross=cross,
            w=w, tw=tw, small_tokens=S)
        if cross:
            in_specs = [any_spec, any_spec, sspec, sspec, sspec, sspec,
                        pos_spec] + pspecs
            operands = (xp, kvp, ci.sel, ci.ksel,
                        ci.qmask.astype(jnp.float32),
                        ci.kmask.astype(jnp.float32), pos) + pops
        else:
            in_specs = [any_spec, sspec, sspec, pos_spec] + pspecs
            operands = (xp, ci.sel, ci.qmask.astype(jnp.float32), pos) + pops
    else:
        mspec = pl.BlockSpec((1, tw, T), lambda b, i, *_: (b, i, 0),
                             memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _kernel_fused_full, nhead=nhead, tau_min=tau_min, cross=cross,
            w=w, tw=tw)
        if cross:
            in_specs = [any_spec, any_spec, mspec, mspec, pos_spec] + pspecs
            operands = (xp, kvp, ci.qmask.astype(jnp.float32),
                        ci.kmask.astype(jnp.float32), pos) + pops
        else:
            in_specs = [any_spec, mspec, pos_spec] + pspecs
            operands = (xp, ci.qmask.astype(jnp.float32), pos) + pops
    alias_src = 2  # operand index of xp, counting the two scalar-prefetch args
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, cap // tw),
            in_specs=in_specs,
            out_specs=any_spec,
            scratch_shapes=scratch,
        ),
        input_output_aliases={alias_src: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(wy, wx, *operands)


# ---------------------------------------------------------------------------
# Pipelined fused layer: double-buffered DMA across grid steps. The in-place
# kernel above serializes DMA-in -> compute -> DMA-out per chunk; here chunk
# j+1's window fetch and chunk j-1's writeback run DURING chunk j's compute
# (2-slot scratch, reconstructed-descriptor waits), so a DMA-bound layer runs
# at ~max(DMA, compute) instead of their sum.
# ---------------------------------------------------------------------------


def _kernel_fused_piped(*refs, nhead, tau_min, cross, w, tw, sel, S, nch,
                        total):
    if sel:
        if cross:
            (wy_ref, wx_ref, x_any, kv_any, selq_ref, selk_ref, qm_ref,
             km_ref, pos_ref), rest = refs[:9], refs[9:]
        else:
            (wy_ref, wx_ref, x_any, selq_ref, qm_ref,
             pos_ref), rest = refs[:6], refs[6:]
    else:
        if cross:
            (wy_ref, wx_ref, x_any, kv_any, qm_ref, km_ref,
             pos_ref), rest = refs[:7], refs[7:]
        else:
            (wy_ref, wx_ref, x_any, qm_ref, pos_ref), rest = refs[:5], refs[5:]
    o_any = rest[17]
    p = rest[:17]
    if cross:
        x_tile, kv_tile, o_tile, in_sems, kv_sems, out_sems = rest[18:]
    else:
        x_tile, o_tile, in_sems, out_sems = rest[18:]
        kv_tile = kv_sems = None
    i = pl.program_id(0)
    C = x_tile.shape[-1]
    T = w * w

    def in_copy(t, start):
        b = t // nch
        base = (t % nch) * tw
        s = jax.lax.rem(t, 2)
        for k in range(tw):
            wy = wy_ref[b, base + k]
            wx = wx_ref[b, base + k]
            src = x_any.at[b, pl.ds(wy * w, w), pl.ds(wx * w, w), :]
            dma = pltpu.make_async_copy(src, x_tile.at[s, k],
                                        in_sems.at[s, k])
            dma.start() if start else dma.wait()
            if cross:
                srck = kv_any.at[b, pl.ds(wy * w, w), pl.ds(wx * w, w), :]
                dmak = pltpu.make_async_copy(srck, kv_tile.at[s, k],
                                             kv_sems.at[s, k])
                dmak.start() if start else dmak.wait()

    def out_copy(t, start):
        b = t // nch
        base = (t % nch) * tw
        s = jax.lax.rem(t, 2)
        for k in range(tw):
            wy = wy_ref[b, base + k]
            wx = wx_ref[b, base + k]
            dst = o_any.at[b, pl.ds(wy * w, w), pl.ds(wx * w, w), :]
            dma = pltpu.make_async_copy(o_tile.at[s, k], dst,
                                        out_sems.at[s, k])
            dma.start() if start else dma.wait()

    @pl.when(i == 0)
    def _():
        in_copy(i, True)

    @pl.when(i + 1 < total)
    def _():
        in_copy(i + 1, True)

    in_copy(i, False)

    @pl.when(i >= 2)
    def _():
        out_copy(i - 2, False)

    def compute(slot):
        x = x_tile[slot].reshape(tw, T, C)
        kv = kv_tile[slot].reshape(tw, T, C) if cross else x
        j = i % nch
        if sel:
            sq = selq_ref[0, pl.ds(j * tw, tw)]
            sk = selk_ref[0, pl.ds(j * tw, tw)] if cross else sq
            qm = qm_ref[0, pl.ds(j * tw, tw)]
            km = km_ref[0, pl.ds(j * tw, tw)] if cross else qm
            out = _layer_body_sel(
                x, kv, sq, sk, qm, km, pos_ref, *p,
                nhead, tau_min, cross, S,
            )
        else:
            qm = qm_ref[0, pl.ds(j * tw, tw)]
            km = km_ref[0, pl.ds(j * tw, tw)] if cross else qm
            out = _layer_body(x, kv, qm, km, pos_ref, *p,
                              nhead, tau_min, cross)
        o_tile[slot] = out.reshape(tw, w, w, C).astype(o_tile.dtype)

    @pl.when(jax.lax.rem(i, 2) == 0)
    def _():
        compute(0)

    @pl.when(jax.lax.rem(i, 2) == 1)
    def _():
        compute(1)

    out_copy(i, True)

    @pl.when(i == total - 1)
    def _():
        if total >= 2:
            out_copy(i - 1, False)
        out_copy(i, False)


def encoder_layer_fused_pipelined(xp, kvp, ci, pos, *params, nhead, tau_min,
                                  cross, window, sel: bool):
    """``encoder_layer_fused_inplace`` with double-buffered DMA (see section
    comment). Same contract: padded carrier updated in place via aliasing,
    forward-only, TPU/interpret only."""
    B = xp.shape[0]
    w = window
    T = w * w
    C = xp.shape[-1]
    cap = ci.idx.shape[1]
    tw = FUSED_TW if cap % FUSED_TW == 0 else TILE_WINDOWS
    assert cap % tw == 0, (cap, tw)
    nch = cap // tw
    total = B * nch
    dt = xp.dtype
    wy, wx = ci.idx[..., 0], ci.idx[..., 1]
    pspecs, pops = _fused_param_specs(params, dt)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    pos_spec = pl.BlockSpec((T, C), lambda *_: (0, 0),
                            memory_space=pltpu.VMEM)
    # per-sample mask/sel blocks: the kernel slices its chunk's rows itself,
    # so block = the whole [cap, S] slab of sample b = i // nch
    S = ci.sel.shape[-1] if sel else T
    slab = lambda: pl.BlockSpec((1, cap, S), lambda i, *_: (i // nch, 0, 0),
                                memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, tw, w, w, C), dt),
        pltpu.VMEM((2, tw, w, w, C), dt),
        pltpu.SemaphoreType.DMA((2, tw)),
        pltpu.SemaphoreType.DMA((2, tw)),
    ]
    if cross:
        scratch.insert(1, pltpu.VMEM((2, tw, w, w, C), dt))
        scratch.insert(3, pltpu.SemaphoreType.DMA((2, tw)))
    kernel = functools.partial(
        _kernel_fused_piped, nhead=nhead, tau_min=tau_min, cross=cross,
        w=w, tw=tw, sel=sel, S=S, nch=nch, total=total)
    if sel:
        if cross:
            in_specs = [any_spec, any_spec, slab(), slab(), slab(), slab(),
                        pos_spec] + pspecs
            operands = (xp, kvp, ci.sel, ci.ksel,
                        ci.qmask.astype(jnp.float32),
                        ci.kmask.astype(jnp.float32), pos) + pops
        else:
            in_specs = [any_spec, slab(), slab(), pos_spec] + pspecs
            operands = (xp, ci.sel, ci.qmask.astype(jnp.float32), pos) + pops
    else:
        if cross:
            in_specs = [any_spec, any_spec, slab(), slab(), pos_spec] + pspecs
            operands = (xp, kvp, ci.qmask.astype(jnp.float32),
                        ci.kmask.astype(jnp.float32), pos) + pops
        else:
            in_specs = [any_spec, slab(), pos_spec] + pspecs
            operands = (xp, ci.qmask.astype(jnp.float32), pos) + pops
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(total,),
            in_specs=in_specs,
            out_specs=any_spec,
            scratch_shapes=scratch,
        ),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(wy, wx, *operands)
