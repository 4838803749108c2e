from .mesh import (create_mesh, default_mesh, init_distributed,
                   reconstruction_mesh)
from .sharding import batch_sharding, put_batch, replicate, shard_params_fsdp

__all__ = [
    "create_mesh",
    "default_mesh",
    "init_distributed",
    "reconstruction_mesh",
    "batch_sharding",
    "put_batch",
    "replicate",
    "shard_params_fsdp",
]
