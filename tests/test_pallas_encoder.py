"""Fused encoder layer: Pallas (interpret) vs jnp reference, gradients, and
equivalence with the unfused module stack (separate attention + LN + FFN)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmae_tpu.ops import pallas_encoder
from tmae_tpu.ops.dense_windows import slot_pos_embed


@pytest.fixture(autouse=True)
def interpret():
    pallas_encoder.set_interpret(True)
    yield
    pallas_encoder.set_interpret(False)


def make_args(seed=0, N=10, T=64, C=128, F=256):
    rng = np.random.RandomState(seed)
    xw = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * 0.5)
    kvw = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * 0.5)
    qmask = jnp.asarray((rng.rand(N, T) < 0.5).astype(np.float32))
    kmask = jnp.asarray((rng.rand(N, T) < 0.5).astype(np.float32))
    pos = slot_pos_embed(8, C)
    w = lambda a, b: jnp.asarray(rng.randn(a, b).astype(np.float32) * 0.05)
    v = lambda a: jnp.asarray(rng.randn(a).astype(np.float32) * 0.05)
    return (xw, kvw, qmask, kmask, pos,
            w(C, C), v(C), w(C, C), v(C), w(C, C), v(C), w(C, C), v(C),
            jnp.asarray([0.7]),
            jnp.ones(C), v(C), w(C, F), v(F), w(F, C), v(C),
            jnp.ones(C), v(C))


@pytest.mark.parametrize('cross', [False, True])
def test_fused_matches_reference(cross):
    args = make_args(cross)
    out_p = pallas_encoder.fused_encoder_layer(*args, 8, 0.01, cross)
    out_r = pallas_encoder.reference_encoder_layer(
        *args, nhead=8, tau_min=0.01, cross=cross
    )
    diff = np.abs(np.asarray(out_p) - np.asarray(out_r)).max()
    assert diff < 5e-3, diff


def test_gradients_match_reference():
    args = make_args()

    def loss_fused(xw, f1w):
        a = list(args)
        a[0], a[16] = xw, f1w
        return jnp.sum(
            pallas_encoder.fused_encoder_layer(*a, 8, 0.01, False) ** 2
        )

    def loss_ref(xw, f1w):
        a = list(args)
        a[0], a[16] = xw, f1w
        return jnp.sum(
            pallas_encoder.reference_encoder_layer(
                *a, nhead=8, tau_min=0.01, cross=False
            ) ** 2
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[16])
    g2 = jax.grad(loss_ref, argnums=(0, 1))(args[0], args[16])
    # fused forward AND backward run their matmuls in bf16 (AMP-class
    # numerics, matching the reference's fp16 training); the f32 reference
    # differs at bf16 resolution — tolerance sized accordingly (structural
    # gradient errors show up as O(1) relative error)
    for a, b in zip(g1, g2):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert err < 5e-2, err


def test_dense_encoder_layer_module_cpu_path():
    """DenseEncoderLayer end-to-end on a small grid (CPU → reference path)."""
    from tmae_tpu.models.sst import DenseEncoderLayer, DenseGrid, VoxelSet
    rng = np.random.RandomState(0)
    V = 32
    coords = np.zeros((1, V, 2), np.int32)
    cells = rng.permutation(32 * 32)[:20]
    coords[0, :20, 0] = cells // 32
    coords[0, :20, 1] = cells % 32
    mask = np.zeros((1, V), bool)
    mask[0, :20] = True
    feat = rng.randn(1, V, 128).astype(np.float32)
    vs = VoxelSet(feat=jnp.asarray(feat), coords=jnp.asarray(coords),
                  mask=jnp.asarray(mask), grid_hw=(32, 32))
    g = DenseGrid(x=vs.to_dense(), occ=vs.occupancy())
    layer = DenseEncoderLayer(128, 8, 256, 8, shift=True)
    variables = layer.init(jax.random.PRNGKey(0), g)
    out = layer.apply(variables, g)
    o = np.asarray(out.x)
    occ = np.asarray(g.occ[0])
    assert np.all(np.isfinite(o))
    assert np.abs(o[0][~occ]).max() == 0.0  # inactive cells stay zero
    assert np.abs(o[0][occ]).max() > 0.0


def test_sel_backward_matches_reference_autodiff():
    """Fused Pallas backward of the token-bucketed (sel) layer vs jnp
    reference autodiff, interpret mode, self + cross. tau tolerates bf16
    accumulation noise (it is a sum over every logit)."""
    from tmae_tpu.ops import pallas_encoder as pe

    C, F, T64, S = 128, 256, 64, 16
    N = 24
    rng = np.random.RandomState(0)
    xw = jnp.asarray(rng.randn(N, T64, C).astype(np.float32) * 0.3)
    kvw = jnp.asarray(rng.randn(N, T64, C).astype(np.float32) * 0.3)
    sel = jnp.asarray(np.stack(
        [rng.permutation(T64)[:S] for _ in range(N)]).astype(np.int32))
    selk = jnp.asarray(np.stack(
        [rng.permutation(T64)[:S] for _ in range(N)]).astype(np.int32))
    qm = jnp.asarray((rng.rand(N, S) < 0.8).astype(np.float32))
    km = jnp.asarray((rng.rand(N, S) < 0.8).astype(np.float32))
    pos = jnp.asarray(rng.randn(T64, C).astype(np.float32) * 0.1)
    pr = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    params = (pr(C, C), pr(C), pr(C, C), pr(C), pr(C, C), pr(C), pr(C, C),
              pr(C), jnp.ones((1,)), jnp.ones((C,)), jnp.zeros((C,)),
              pr(C, F), pr(F), pr(F, C), pr(C), jnp.ones((C,)),
              jnp.zeros((C,)))
    g = jnp.asarray(rng.randn(N, T64, C).astype(np.float32))

    for cross in (False, True):
        def f(x, kv, *w):
            return pe.fused_encoder_layer_sel(
                x, kv, sel, selk, qm, km, pos, *w, 8, 0.01, cross)

        def fr(x, kv, *w):
            return pe.reference_encoder_layer_sel(
                x, kv, sel, selk, qm, km, pos, *w,
                nhead=8, tau_min=0.01, cross=cross)

        _, vjp_ref = jax.vjp(fr, xw, kvw, *params)
        grads_ref = vjp_ref(g)
        pe.set_interpret(True)
        try:
            _, vjp_p = jax.vjp(f, xw, kvw, *params)
            grads_p = vjp_p(g)
        finally:
            pe.set_interpret(False)
        for i, (a, b) in enumerate(zip(grads_p, grads_ref)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            tol = 0.06 if i == 10 else 0.02  # i==10: tau
            err = np.abs(a - b).max()
            assert err <= tol * max(np.abs(b).max(), 1e-3) + 2e-3, (
                f'grad {i} (cross={cross}): err {err}')
