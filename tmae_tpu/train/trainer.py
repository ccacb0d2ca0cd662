"""Jitted training/eval steps and the data-parallel mesh wiring.

The reference's per-GPU DDP loop (``tools/train_utils/train_utils.py:15-146``)
becomes a single jitted ``train_step`` whose batch is sharded over the mesh's
``data`` axis: XLA inserts the gradient all-reduce over ICI (SURVEY.md §2.6 TPU
equivalent). BatchNorm statistics are computed over the global batch (sync-BN
semantics).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel.mesh import (  # noqa: F401  (re-exported for callers)
    jit_train_step, make_data_mesh, replicate_state, shard_batch,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']),
    )


def collect_occ_overflow(intermediates) -> jnp.ndarray:
    """Sum every sowed 'occ_overflow' counter (models/sst.py, models/wca.py)
    across stages; returns a scalar (0 when no stage uses compaction)."""
    total = jnp.zeros((), jnp.int32)
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        if any(getattr(p, 'key', None) == 'occ_overflow' for p in path):
            total = total + jnp.asarray(leaf, jnp.int32).sum()
    return total


def make_train_step(model, loss_fn: Callable, tx,
                    rng_names: tuple = ()) -> Callable:
    """loss_fn(outputs, batch) → (loss, tb_dict).

    Returns train_step(state, batch, rng) → (state, metrics).
    """

    def train_step(state: TrainState, batch, rng):
        rngs = (
            {name: jax.random.fold_in(rng, i)
             for i, name in enumerate(rng_names)}
            if rng_names else None
        )

        def compute(params):
            out, mut = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, mutable=['batch_stats', 'intermediates'],
                rngs=rngs,
            )
            loss, tb = loss_fn(out, batch)
            # runtime observability for the compaction caps (VERDICT r3 #4):
            # every SSTBlock/WCABlock sows 'occ_overflow' (occupied windows
            # beyond its cap that degraded to identity); surface the total so
            # cap overflow is visible in metrics.jsonl instead of silently
            # costing accuracy (reference drop accounting:
            # spt_backbone.py:62-70)
            tb = dict(tb)
            tb['occ_overflow'] = collect_occ_overflow(
                mut.get('intermediates', {}))
            return loss, (tb, mut['batch_stats'])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            'loss': loss,
            'grad_norm': optax.global_norm(grads),
            **tb,
        }
        return (
            TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            metrics,
        )

    return train_step
