from . import distributed  # noqa: F401
from .mesh import (  # noqa: F401
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    param_partition_spec,
)
