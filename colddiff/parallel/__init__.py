from .mesh import (  # noqa: F401
    data_sharding,
    fsdp_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_state,
)
