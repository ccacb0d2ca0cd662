"""Pallas TPU kernel: fused cosine window attention.

Fuses q/k/v projection, per-head cosine normalization, masked softmax, value
aggregation and output projection for a tile of windows entirely in VMEM — the
XLA path materializes the ``[B, NW, H, T, T]`` logits (≈0.5 GB at stride 1) in
HBM, which dominates the layer's runtime. The kernel streams each window tile
once: HBM traffic per layer drops to ~2x the window tensor.

Forward-only; ``fused_window_attention`` wraps it in a ``jax.custom_vjp`` whose
backward differentiates the reference jnp formulation (identical math), so the
kernel is usable under ``jax.grad`` with XLA-speed backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_WINDOWS = 16  # windows per grid step; VMEM-bounded (TW=32 overflows 16MB)

# interpret mode for CPU tests (set by conftest / callers)
_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _attention_math(q, k, v, kmask, tau, nhead, tau_min):
    """Reference attention math on [W, T, C] tiles (f32); shared by the kernel
    body and the backward/fallback path."""
    W, T, C = q.shape
    H, D = nhead, C // nhead
    qh = q.reshape(W, T, H, D)
    kh = k.reshape(W, T, H, D)
    vh = v.reshape(W, T, H, D)
    qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
    kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
    scale = 1.0 / jnp.maximum(tau, tau_min)
    logits = jnp.einsum('wthd,wshd->whts', qh * scale, kh,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(kmask[:, None, None, :] > 0, logits, -30000.0)
    p = jax.nn.softmax(logits, axis=-1)
    any_key = jnp.any(kmask > 0, axis=-1)[:, None, None, None]
    p = jnp.where(any_key, p, 0.0)
    out = jnp.einsum('whts,wshd->wthd', p, vh)
    return out.reshape(W, T, C)


def _kernel(x_ref, kv_ref, kmask_ref, pos_ref, wq_ref, bq_ref, wk_ref, bk_ref,
            wv_ref, bv_ref, wo_ref, bo_ref, tau_ref, o_ref, *, nhead, tau_min,
            cross):
    W, T, C = x_ref.shape
    x = x_ref[:]
    kv = kv_ref[:] if cross else x
    pos = pos_ref[:]
    xp = (x + pos[None]).reshape(W * T, C)
    q = jnp.dot(xp, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[0]
    if cross:
        kvp = (kv + pos[None]).reshape(W * T, C)
    else:
        kvp = xp
    k = jnp.dot(kvp, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[0]
    v = jnp.dot(kv.reshape(W * T, C), wv_ref[:],
                preferred_element_type=jnp.float32) + bv_ref[0]
    tau = tau_ref[0, 0]
    # Mosaic constraints: ≤1 matmul batch dim, no head-splitting reshapes of the
    # lane dim. Loop over heads, slicing each head's channel block (static lane
    # slices) and batching the T x D matmuls over the window dim.
    H, D = nhead, C // nhead
    scale = 1.0 / jnp.maximum(tau, tau_min)
    km = kmask_ref[:]  # [W, T]
    has_key = jnp.any(km > 0, axis=-1)[:, None, None]  # [W, 1, 1]
    q3 = q.reshape(W, T, C)
    k3 = k.reshape(W, T, C)
    v3 = v.reshape(W, T, C)
    outs = []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh = q3[:, :, sl]
        kh = k3[:, :, sl]
        vh = v3[:, :, sl]
        qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24)
        kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24)
        logits = jax.lax.dot_general(
            qh * scale, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [W, T, T]
        logits = jnp.where(km[:, None, :] > 0, logits, -30000.0)
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.where(has_key, p, 0.0)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )  # [W, T, D]
    out = jnp.concatenate(outs, axis=-1)  # [W, T, C]
    out = jnp.dot(out.reshape(W * T, C).astype(x.dtype), wo_ref[:],
                  preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = out.reshape(W, T, C).astype(o_ref.dtype)


def _pallas_forward(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau,
                    nhead, tau_min, cross):
    N, T, C = xw.shape
    TW = TILE_WINDOWS
    padded = ((N + TW - 1) // TW) * TW
    if padded != N:
        padz = lambda a: jnp.pad(a, ((0, padded - N),) + ((0, 0),) * (a.ndim - 1))
        xw, kvw, kmask = padz(xw), padz(kvw), padz(kmask)
    grid = (padded // TW,)
    kernel = functools.partial(_kernel, nhead=nhead, tau_min=tau_min,
                               cross=cross)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((padded, T, C), xw.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TW, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TW, T, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
    )(xw, kvw, kmask, pos, wq.astype(xw.dtype), bq.reshape(1, -1),
      wk.astype(xw.dtype), bk.reshape(1, -1), wv.astype(xw.dtype),
      bv.reshape(1, -1), wo.astype(xw.dtype), bo.reshape(1, -1),
      tau.reshape(1, 1))
    return out[:N]


def _reference_forward(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                       tau, nhead, tau_min, cross):
    kv = kvw if cross else xw
    xp = xw + pos[None]
    q = (xp.astype(jnp.float32) @ wq.astype(jnp.float32)) + bq
    kvp = (kv + pos[None]) if cross else xp
    k = (kvp.astype(jnp.float32) @ wk.astype(jnp.float32)) + bk
    v = (kv.astype(jnp.float32) @ wv.astype(jnp.float32)) + bv
    out = _attention_math(q, k, v, kmask, tau[0], nhead, tau_min)
    return ((out.astype(jnp.float32) @ wo.astype(jnp.float32)) + bo).astype(
        xw.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_window_attention(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                           tau, nhead: int, tau_min: float, cross: bool):
    """xw/kvw [N, T, C], kmask [N, T] (1/0 float), pos [T, C]; weights [C, C]
    (wq includes no normalization); tau [1]. Returns [N, T, C]."""
    return _pallas_forward(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                           tau, nhead, tau_min, cross)


def _fwd(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau, nhead,
         tau_min, cross):
    out = _pallas_forward(xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                          tau, nhead, tau_min, cross)
    return out, (xw, kvw, kmask, pos, wq, bq, wk, bk, wv, bv, wo, bo, tau)


def _bwd(nhead, tau_min, cross, residuals, g):
    args = residuals
    _, vjp = jax.vjp(
        lambda *a: _reference_forward(*a, nhead=nhead, tau_min=tau_min,
                                      cross=cross),
        *args,
    )
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
