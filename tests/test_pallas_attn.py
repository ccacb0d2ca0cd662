"""Pallas fused window attention vs the jnp reference path (interpret mode on
CPU) + gradient flow through the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmae_tpu.ops import pallas_attn
from tmae_tpu.ops.dense_windows import slot_pos_embed


@pytest.fixture(autouse=True)
def interpret():
    pallas_attn.set_interpret(True)
    yield
    pallas_attn.set_interpret(False)


def make_args(seed=0, N=12, T=64, C=128, cross=False):
    rng = np.random.RandomState(seed)
    xw = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * 0.5)
    kvw = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * 0.5)
    kmask = jnp.asarray((rng.rand(N, T) < 0.4).astype(np.float32))
    pos = slot_pos_embed(8, C)
    w = lambda: jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    b = lambda: jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    tau = jnp.asarray([0.8])
    return (xw, kvw, kmask, pos, w(), b(), w(), b(), w(), b(), w(), b(), tau)


@pytest.mark.parametrize('cross', [False, True])
def test_pallas_matches_reference(cross):
    args = make_args(cross=cross)
    out_p = pallas_attn.fused_window_attention(*args, 8, 0.01, cross)
    out_r = pallas_attn._reference_forward(*args, 8, 0.01, cross)
    assert np.allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-3), (
        np.abs(np.asarray(out_p) - np.asarray(out_r)).max()
    )


def test_gradients_flow():
    args = make_args()

    def loss(xw, wq):
        a = list(args)
        a[0] = xw
        a[4] = wq
        out = pallas_attn.fused_window_attention(*a, 8, 0.01, False)
        return jnp.sum(out ** 2)

    g_x, g_w = jax.grad(loss, argnums=(0, 1))(args[0], args[4])
    assert np.all(np.isfinite(np.asarray(g_x)))
    assert float(jnp.abs(g_w).sum()) > 0

    # grads match the pure-reference grads
    def loss_ref(xw, wq):
        a = list(args)
        a[0] = xw
        a[4] = wq
        out = pallas_attn._reference_forward(*a, 8, 0.01, False)
        return jnp.sum(out ** 2)

    r_x, r_w = jax.grad(loss_ref, argnums=(0, 1))(args[0], args[4])
    assert np.allclose(np.asarray(g_x), np.asarray(r_x), atol=1e-3)
    assert np.allclose(np.asarray(g_w), np.asarray(r_w), atol=1e-3)
