"""Checkpoint save/restore roundtrip + pretrained partial transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmae_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, latest_checkpoint,
    load_pretrained_params,
)
from tmae_tpu.train.trainer import TrainState, create_train_state


def make_state(seed=0):
    rng = np.random.RandomState(seed)
    variables = {
        'params': {'layer': {'kernel': jnp.asarray(rng.randn(4, 4),
                                                   jnp.float32),
                             'bias': jnp.zeros(4)}},
        'batch_stats': {'layer': {'mean': jnp.zeros(4), 'var': jnp.ones(4)}},
    }
    tx = optax.adam(1e-3)
    return variables, tx, create_train_state(variables, tx)


def test_roundtrip(tmp_path):
    variables, tx, state = make_state()
    state = TrainState(step=jnp.asarray(7), params=state.params,
                       batch_stats=state.batch_stats,
                       opt_state=state.opt_state)
    path = save_checkpoint(tmp_path / 'ckpt', state, 7, max_keep=2)
    assert latest_checkpoint(tmp_path / 'ckpt') == path

    _, _, fresh = make_state(seed=1)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 7
    assert np.allclose(np.asarray(restored.params['layer']['kernel']),
                       np.asarray(state.params['layer']['kernel']))


def test_retention_pruning(tmp_path):
    variables, tx, state = make_state()
    for s in range(1, 5):
        save_checkpoint(tmp_path / 'ckpt', state, s, max_keep=2)
    names = sorted(p.name for p in (tmp_path / 'ckpt').glob('checkpoint_*'))
    assert names == ['checkpoint_3', 'checkpoint_4']


def test_pretrained_partial_load(tmp_path):
    variables, tx, state = make_state()
    path = save_checkpoint(tmp_path / 'ckpt', state, 1)
    # target with one matching and one new leaf
    target = {
        'layer': {'kernel': np.zeros((4, 4), np.float32),
                  'bias': np.zeros(4, np.float32)},
        'new_head': {'kernel': np.ones((4, 2), np.float32)},
    }
    merged = load_pretrained_params(path, target)
    assert np.allclose(merged['layer']['kernel'],
                       np.asarray(state.params['layer']['kernel']))
    assert np.allclose(merged['new_head']['kernel'], 1.0)  # kept at init
