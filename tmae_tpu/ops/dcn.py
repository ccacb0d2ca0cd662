"""Modulated deformable convolution v2 (reference ``pcdet/ops/dcn``, the CUDA
DCNv2 used by the DLA image backbone of GraphRCNN's camera-fusion variant).

TPU re-design: instead of the CUDA im2col-with-offsets kernel, the sampling
grid is materialized as a dense bilinear gather — XLA lowers the gathers and
the tap-contraction matmul onto the MXU. Static shapes throughout; NHWC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(img, ys, xs):
    """img [H, W, C]; ys/xs [...] float → [..., C], zero outside."""
    H, W, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    out = 0.0
    for dy, dx, w in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                      (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
        yy = y0 + dy
        xx = x0 + dx
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[jnp.clip(yy, 0, H - 1).astype(jnp.int32),
                jnp.clip(xx, 0, W - 1).astype(jnp.int32)]
        out = out + jnp.where(inb[..., None], v, 0.0) * w[..., None]
    return out


@partial(jax.jit, static_argnames=('stride', 'padding', 'dilation'))
def deform_conv2d(x, offset, mask, weight, bias=None, stride: int = 1,
                  padding: int = 1, dilation: int = 1):
    """DCNv2 forward.

    x [B, H, W, Cin]; offset [B, Ho, Wo, 2*kh*kw] ((dy, dx) per tap);
    mask [B, Ho, Wo, kh*kw] (modulation, typically sigmoid-activated);
    weight [kh, kw, Cin, Cout]. Returns [B, Ho, Wo, Cout].
    """
    kh, kw, cin, cout = weight.shape
    B, H, W, _ = x.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    K = kh * kw

    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    ty, tx = jnp.meshgrid(jnp.arange(kh) * dilation,
                          jnp.arange(kw) * dilation, indexing='ij')
    base_y = oy[:, None, None] + ty.reshape(-1)[None, None, :]  # [Ho,1,K]
    base_x = ox[None, :, None] + tx.reshape(-1)[None, None, :]  # [1,Wo,K]

    off = offset.reshape(B, Ho, Wo, K, 2)
    ys = base_y[None, :, :, :] + off[..., 0]
    xs = base_x[None, :, :, :] + off[..., 1]

    sampled = jax.vmap(_bilinear_sample)(x, ys, xs)   # [B, Ho, Wo, K, Cin]
    sampled = sampled * mask.reshape(B, Ho, Wo, K, 1)
    out = jnp.einsum('bhwkc,kco->bhwo', sampled,
                     weight.reshape(K, cin, cout))
    if bias is not None:
        out = out + bias
    return out
