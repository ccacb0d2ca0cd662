"""Numeric equivalence of layer primitives against torch (CPU) after weight
conversion — validates both the converter's tensor-layout transforms and this
framework's layer semantics (BN eps/momentum, GELU, LayerNorm, cosine MHA)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp
import flax.linen as nn

from tmae_tpu.utils import torch_convert as tc
from tmae_tpu.models.layers import MaskedBatchNorm, BatchNorm2d


def test_linear():
    tl = torch.nn.Linear(8, 16)
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    ref = tl(torch.from_numpy(x)).detach().numpy()
    p = tc.linear(tl.weight.detach().numpy(), tl.bias.detach().numpy())
    out = nn.Dense(16).apply({'params': p}, jnp.asarray(x))
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_conv2d():
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1, bias=True)
    x = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()  # NCHW
    p = tc.conv2d(tconv.weight.detach().numpy(), tconv.bias.detach().numpy())
    out = nn.Conv(5, (3, 3), padding='SAME').apply(
        {'params': p}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_conv2d_dilated():
    tconv = torch.nn.Conv2d(3, 5, 3, padding=2, dilation=2, bias=False)
    x = np.random.RandomState(2).randn(1, 3, 10, 10).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    p = tc.conv2d(tconv.weight.detach().numpy())
    out = nn.Conv(5, (3, 3), padding=((2, 2), (2, 2)),
                  kernel_dilation=(2, 2), use_bias=False).apply(
        {'params': p}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_strided_conv2d_k3s2p1():
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1, bias=False)
    x = np.random.RandomState(3).randn(1, 3, 9, 9).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    p = tc.conv2d(tconv.weight.detach().numpy())
    out = nn.Conv(5, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  use_bias=False).apply(
        {'params': p}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert out.shape[1:3] == ref.shape[2:]
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


@pytest.mark.parametrize('stride', [1, 2, 4])
def test_conv_transpose2d_k_eq_s(stride):
    tconv = torch.nn.ConvTranspose2d(4, 6, stride, stride=stride, bias=False)
    x = np.random.RandomState(4).randn(1, 4, 6, 6).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()
    p = tc.conv_transpose2d(tconv.weight.detach().numpy())
    out = nn.ConvTranspose(6, (stride, stride), strides=(stride, stride),
                           use_bias=False).apply(
        {'params': p}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_batchnorm_eval_mode():
    tbn = torch.nn.BatchNorm1d(6, eps=1e-3, momentum=0.01)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.rand(6))
        tbn.running_var.copy_(torch.rand(6) + 0.5)
        tbn.weight.copy_(torch.rand(6))
        tbn.bias.copy_(torch.rand(6))
    x = np.random.RandomState(5).randn(10, 6).astype(np.float32)
    ref = tbn(torch.from_numpy(x)).detach().numpy()
    p, s = tc.batchnorm(tbn.weight.detach().numpy(), tbn.bias.detach().numpy(),
                        tbn.running_mean.numpy(), tbn.running_var.numpy())
    out = MaskedBatchNorm().apply(
        {'params': p, 'batch_stats': s}, jnp.asarray(x), jnp.ones(10, bool),
        use_running_average=True,
    )
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_cosine_mha_matches_torch_reimpl():
    """Full cosine window attention vs a direct torch computation of the
    reference's _scaled_cosine_attention (cosine_msa.py:114-176) on one window."""
    C, H, T = 16, 4, 6
    rng = np.random.RandomState(6)
    feat = rng.randn(T, C).astype(np.float32)
    pos = rng.randn(T, C).astype(np.float32)
    in_proj_w = rng.randn(3 * C, C).astype(np.float32) * 0.2
    in_proj_b = rng.randn(3 * C).astype(np.float32) * 0.1
    out_w = rng.randn(C, C).astype(np.float32) * 0.2
    out_b = rng.randn(C).astype(np.float32) * 0.1
    tau_v = np.array([0.7], np.float32)

    # torch reference
    q_in = torch.from_numpy(feat + pos)
    kv_in = torch.from_numpy(feat)
    W = torch.from_numpy(in_proj_w)
    Bb = torch.from_numpy(in_proj_b)
    q = q_in @ W[:C].T + Bb[:C]
    k = q_in @ W[C:2 * C].T + Bb[C:2 * C]
    v = kv_in @ W[2 * C:].T + Bb[2 * C:]
    D = C // H
    qh = q.reshape(T, H, D).permute(1, 0, 2)
    kh = k.reshape(T, H, D).permute(1, 0, 2)
    vh = v.reshape(T, H, D).permute(1, 0, 2)
    qh = torch.nn.functional.normalize(qh, dim=2)
    kh = torch.nn.functional.normalize(kh, dim=2)
    attn = torch.bmm(qh, kh.transpose(1, 2)) / max(float(tau_v[0]), 0.01)
    attn = torch.softmax(attn, dim=-1)
    o = torch.bmm(attn, vh).permute(1, 0, 2).reshape(T, C)
    ref = (o @ torch.from_numpy(out_w).T + torch.from_numpy(out_b)).numpy()

    # our module on a single fully-occupied window
    from tmae_tpu.models.sst import CosineWindowAttention
    from tmae_tpu.ops.windows import window_partition
    import jax.numpy as jnp
    coords = np.array([[[0, i] for i in range(T)]], np.int32)
    valid = np.ones((1, T), bool)
    wp = window_partition(jnp.asarray(coords), jnp.asarray(valid), (8, 8),
                          window=8, shift=False)
    proj = tc.mha_in_proj(in_proj_w, in_proj_b)
    params = {
        **proj,
        'out_proj': tc.linear(out_w, out_b),
        'tau': jnp.asarray(tau_v),
    }
    mod = CosineWindowAttention(d_model=C, nhead=H)
    out = mod.apply(
        {'params': params}, jnp.asarray(feat[None]), jnp.asarray(pos[None]), wp,
        jnp.asarray(feat[None]), jnp.asarray(pos[None]), wp,
    )
    assert np.allclose(np.asarray(out[0]), ref, atol=1e-4)


def test_layernorm_and_gelu():
    tln = torch.nn.LayerNorm(12)
    with torch.no_grad():
        tln.weight.copy_(torch.rand(12))
        tln.bias.copy_(torch.rand(12))
    x = np.random.RandomState(7).randn(5, 12).astype(np.float32)
    ref = tln(torch.from_numpy(x)).detach().numpy()
    p = tc.layernorm(tln.weight.detach().numpy(), tln.bias.detach().numpy())
    out = nn.LayerNorm().apply({'params': p}, jnp.asarray(x))
    assert np.allclose(np.asarray(out), ref, atol=1e-5)
    # torch F.gelu (exact) vs flax nn.gelu default (tanh approx) — we rely on
    # flax's exact variant
    g_ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    g = nn.gelu(jnp.asarray(x), approximate=False)
    assert np.allclose(np.asarray(g), g_ref, atol=1e-5)
