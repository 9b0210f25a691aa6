from .mesh import (  # noqa: F401
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    param_partition_spec,
)
