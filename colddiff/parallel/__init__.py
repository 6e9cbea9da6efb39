from .distributed import init_multihost  # noqa: F401
from .mesh import (  # noqa: F401
    data_sharding,
    fsdp_sharding,
    image_sharding,
    make_mesh,
    make_mesh_2d,
    put_like,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_images,
    shard_state,
)
