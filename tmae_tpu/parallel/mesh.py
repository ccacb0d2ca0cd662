"""Device mesh + sharding helpers.

The reference's only parallelism strategy is data parallelism over NCCL DDP
(SURVEY.md §2.6). Here that maps to a 1-D ``data`` mesh over ICI: the jitted train
step consumes a batch sharded over ``data`` and replicated state; XLA inserts the
gradient all-reduce. Multi-host runs initialize ``jax.distributed`` and shard the
input pipeline per process (``process_sharded_indices``). Works identically on a
virtual CPU mesh (``--xla_force_host_platform_device_count``) for testing.

BatchNorm note: batch statistics are computed by full-batch reductions inside the
jitted step, so under data parallelism they are global (the reference's optional
``--sync_bn``; its default per-GPU stats are a strictly noisier estimate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ('data',))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (leading batch dim) onto the mesh's data axis."""
    sharding = NamedSharding(mesh, P('data'))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate_state(state, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def jit_train_step(train_step, mesh: Mesh):
    """Jit with batch sharded over the data axis and replicated state; XLA emits
    the psum over ICI (replaces DDP allreduce, train_utils.py:91)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def process_sharded_indices(n: int, process_index: int, process_count: int,
                            shuffle_seed=None):
    """Per-host slice of the dataset, padded to equal length (the
    DistributedSampler role, datasets/__init__.py:22-42)."""
    idx = np.arange(n)
    if shuffle_seed is not None:
        np.random.RandomState(shuffle_seed).shuffle(idx)
    per = int(np.ceil(n / process_count))
    padded = np.concatenate([idx, idx[: per * process_count - n]])
    return padded[process_index::process_count]
