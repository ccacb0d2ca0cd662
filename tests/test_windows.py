import dataclasses

import jax.numpy as jnp
import numpy as np

from tmae_tpu.ops.windows import (
    num_windows, window_partition, couple_partitions, scatter_to_windows,
    gather_from_windows, window_key_mask,
)


def mk(coords, V=8):
    c = np.zeros((1, V, 2), np.int32)
    m = np.zeros((1, V), bool)
    for i, (y, x) in enumerate(coords):
        c[0, i] = [y, x]
        m[0, i] = True
    return jnp.asarray(c), jnp.asarray(m)


def test_num_windows():
    assert num_windows((468, 468), 8) == (60, 60)
    assert num_windows((32, 32), 8) == (5, 5)


def test_partition_unshifted_groups_8x8():
    # voxels (0,0) and (7,7) share a window; (8,0) is in the next row-window
    c, m = mk([(0, 0), (7, 7), (8, 0)])
    wp = window_partition(c, m, (32, 32), window=8, shift=False)
    ws = np.asarray(wp.win_slot[0])
    assert ws[0] == ws[1]
    assert ws[0] != ws[2]
    # invalid voxels carry the sentinel
    assert ws[-1] == wp.nw
    # in-window coords = raw coords % 8 (offset is a full window for shift0)
    assert np.allclose(np.asarray(wp.pos_yx[0, 1]), [7.0, 7.0])


def test_partition_shifted():
    # with a half-window (4) shift, (3,3) and (4,4) split into different windows
    c, m = mk([(3, 3), (4, 4)])
    wp0 = window_partition(c, m, (32, 32), window=8, shift=False)
    wp1 = window_partition(c, m, (32, 32), window=8, shift=True)
    assert np.asarray(wp0.win_slot[0])[0] == np.asarray(wp0.win_slot[0])[1]
    assert np.asarray(wp1.win_slot[0])[0] != np.asarray(wp1.win_slot[0])[1]


def test_inner_slot_unique_within_window():
    # fast path (max_tokens == 64): slot is the positional index — unique, < 64
    c, m = mk([(0, 0), (0, 1), (1, 0), (8, 8)])
    wp = window_partition(c, m, (32, 32), window=8, shift=False)
    r = np.asarray(wp.inner_rank[0])[:4]
    assert len(set(r[:3].tolist())) == 3 and r[:3].max() < 64
    assert np.asarray(wp.keep[0])[:4].all()


def test_inner_rank_dense_when_capped():
    # sort-based path (max_tokens < window^2): ranks are dense 0..n-1
    c, m = mk([(0, 0), (0, 1), (1, 0), (8, 8)])
    wp = window_partition(c, m, (32, 32), window=8, shift=False, max_tokens=4)
    r = np.asarray(wp.inner_rank[0])[:4]
    assert sorted(r[:3].tolist()) == [0, 1, 2]
    assert r[3] == 0


def test_max_tokens_drop():
    coords = [(0, i % 8) for i in range(6)]
    c, m = mk(coords)
    wp = window_partition(c, m, (32, 32), window=8, shift=False, max_tokens=4)
    keep = np.asarray(wp.keep[0])
    assert keep[:6].sum() == 4


def test_window_roundtrip():
    c, m = mk([(0, 0), (0, 5), (20, 20), (31, 31)])
    wp = window_partition(c, m, (32, 32), window=8, shift=True, max_tokens=64)
    feat = jnp.asarray(
        (np.arange(8, dtype=np.float32)[None, :, None] + 1.0) * np.ones((1, 8, 3))
    )
    win = scatter_to_windows(feat, wp)
    assert win.shape == (1, wp.nw, 64, 3)
    back = gather_from_windows(win, wp)
    keep = np.asarray(wp.keep[0])
    assert np.allclose(np.asarray(back[0])[keep], np.asarray(feat[0])[keep])
    km = window_key_mask(wp)
    assert int(np.asarray(km).sum()) == keep.sum()
    # scattered values land where the key mask says
    assert np.allclose(
        np.asarray(win)[np.asarray(km)].sum(), np.asarray(feat[0])[keep].sum()
    )


def test_couple_partitions_drops_windows_empty_in_either():
    c_cur, m_cur = mk([(0, 0), (16, 16)])
    c_prv, m_prv = mk([(0, 1)])  # only the first window occupied in prev
    wp_c = window_partition(c_cur, m_cur, (32, 32), window=8, shift=False)
    wp_p = window_partition(c_prv, m_prv, (32, 32), window=8, shift=False)
    g_c, g_p = couple_partitions(wp_c, wp_p)
    keep_c = np.asarray(g_c.keep[0])
    assert keep_c[0] and not keep_c[1]  # (16,16) has no prev partner → dropped
    assert np.asarray(g_p.keep[0])[0]
