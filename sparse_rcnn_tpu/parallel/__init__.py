from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_state,
    replicated,
    shard_batch,
)
