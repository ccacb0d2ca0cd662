"""The Pallas sorted-segment-max scan (serving VFE fast path) must match the
scatter-based segment_max bit-for-bit on sorted inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from tmae_tpu.ops import sorted_segments
from tmae_tpu.ops.voxelize import segment_max


@pytest.fixture(autouse=True)
def _interpret():
    sorted_segments.set_interpret(True)
    yield
    sorted_segments.set_interpret(False)


def _case(rng, B, P, V, C, frac_invalid=0.2):
    """Random sorted segment layout with segments split across blocks."""
    seg = np.zeros((B, P), np.int32)
    ends = np.zeros((B, V), np.int32)
    mask = np.zeros((B, V), bool)
    feat = rng.randn(B, P, C).astype(np.float32)
    for b in range(B):
        n_valid = int(P * (1 - frac_invalid))
        nseg = rng.randint(V // 2, V + 1)
        cuts = np.sort(rng.choice(np.arange(1, n_valid), nseg - 1,
                                  replace=False))
        bounds = np.concatenate([[0], cuts, [n_valid]])
        for v in range(nseg):
            seg[b, bounds[v]:bounds[v + 1]] = v
            ends[b, v] = bounds[v + 1] - 1
            mask[b, v] = True
        seg[b, n_valid:] = V  # OOB sentinel rows (invalid points)
    return (jnp.asarray(feat), jnp.asarray(seg), jnp.asarray(ends),
            jnp.asarray(mask))


@pytest.mark.parametrize('P,block', [(256, 64), (512, 128)])
def test_matches_scatter_segment_max(P, block):
    rng = np.random.RandomState(0)
    B, V, C = 2, 37, 8
    feat, seg, ends, mask = _case(rng, B, P, V, C)
    got = sorted_segments.sorted_segment_max(feat, seg, ends, mask, V,
                                             block=block)
    # scatter reference: invalid rows masked to -inf (slot V is dropped by
    # segment_max anyway, but this mirrors the train path exactly)
    want = jnp.where(mask[..., None],
                     segment_max(feat, seg, V), 0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_segment_spanning_many_blocks():
    """One segment covering several whole blocks exercises the carry chain."""
    B, P, V, C, block = 1, 256, 4, 4, 32
    feat = np.random.RandomState(1).randn(B, P, C).astype(np.float32)
    seg = np.zeros((B, P), np.int32)
    seg[0, :200] = 0   # spans 6+ blocks
    seg[0, 200:220] = 1
    seg[0, 220:230] = 2
    seg[0, 230:] = V   # invalid tail
    ends = np.array([[199, 219, 229, 0]], np.int32)
    mask = np.array([[True, True, True, False]])
    got = sorted_segments.sorted_segment_max(
        jnp.asarray(feat), jnp.asarray(seg), jnp.asarray(ends),
        jnp.asarray(mask), V, block=block)
    want = np.zeros((B, V, C), np.float32)
    want[0, 0] = feat[0, :200].max(axis=0)
    want[0, 1] = feat[0, 200:220].max(axis=0)
    want[0, 2] = feat[0, 220:230].max(axis=0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_cpu_fallback_matches():
    """Without interpret/TPU the function must route to the scatter path."""
    sorted_segments.set_interpret(False)
    rng = np.random.RandomState(2)
    feat, seg, ends, mask = _case(rng, 1, 128, 16, 4)
    got = sorted_segments.sorted_segment_max(feat, seg, ends, mask, 16,
                                             block=64)
    want = jnp.where(mask[..., None], segment_max(feat, seg, 16), 0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.tpu
def test_real_tpu_production_shapes():
    """Mosaic lowering regression guard (ADVICE r4 #3): the REAL-TPU kernel
    must be bit-equal to the scatter segment_max at production-like shapes,
    f32 and bf16. Runs only when a TPU backend is attached
    (pytest -m tpu outside the CPU-forced default conftest)."""
    import jax

    if jax.default_backend() == 'cpu':
        pytest.skip('needs a real TPU backend')
    sorted_segments.set_interpret(False)
    rng = np.random.RandomState(3)
    B, P, V, C = 1, 131072, 4096, 128
    feat, seg, ends, mask = _case(rng, B, P, V, C)
    for dt in (jnp.float32, jnp.bfloat16):
        f = feat.astype(dt)
        got = sorted_segments.sorted_segment_max(f, seg, ends, mask, V,
                                                 block=1024)
        want = jnp.where(mask[..., None], segment_max(f, seg, V),
                         jnp.zeros((), dt))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gradient_matches_scatter_path():
    """The round-5 custom VJP must match segment_max's gradient (even split
    among tied maxima), including relu-style ties and invalid OOB rows."""
    import jax

    rng = np.random.RandomState(4)
    B, P, V, C, block = 1, 128, 16, 4, 32
    feat, seg, ends, mask = _case(rng, B, P, V, C)
    # force ties: quantize features coarsely
    feat = jnp.round(feat * 2.0) / 2.0
    w = jnp.asarray(rng.randn(V, C).astype(np.float32))

    def loss_sorted(f):
        out = sorted_segments.sorted_segment_max(f, seg, ends, mask, V,
                                                 block)
        return jnp.sum(out * w)

    def loss_scatter(f):
        out = jnp.where(mask[..., None], segment_max(f, seg, V), 0.0)
        return jnp.sum(out * w)

    g1 = jax.grad(loss_sorted)(feat)
    g2 = jax.grad(loss_scatter)(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
