from .mesh import (  # noqa: F401
    make_data_mesh, shard_batch, replicate_state, jit_train_step,
    process_sharded_indices,
)
