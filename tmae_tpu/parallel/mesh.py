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
    """Place a host batch (leading batch dim) onto the mesh's data axis.

    Single-process: plain device_put. Multi-process: each process holds only
    its LOCAL slice (the loader shards samples per process), so the global
    array is assembled from per-process local data — the jax analog of DDP's
    per-rank batches."""
    sharding = NamedSharding(mesh, P('data'))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate train state over every device. Multi-process: device_put with
    a fully-replicated sharding requires the same host value on all processes
    (true here: same seed → same init; checkpoints restore identically)."""
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


def all_gather_objects(obj):
    """Gather arbitrary picklables from every process (the reference
    ``commu_utils.all_gather`` role, commu_utils.py:50-111). The payloads are
    ragged across processes, so each ships as a max-size-padded uint8 array —
    ``process_allgather`` itself requires identical shapes on every process.
    Returns a list of ``process_count`` objects, ordered by process index."""
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]


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
