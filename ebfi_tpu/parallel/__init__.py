"""Device-mesh / sharding utilities (ICI-first SPMD)."""
from .mesh import (
    make_mesh,
    dp_shardings,
    spatial_shardings,
    local_shard_info,
    maybe_init_distributed,
    put_global_batch,
)

__all__ = [
    "make_mesh",
    "dp_shardings",
    "spatial_shardings",
    "local_shard_info",
    "maybe_init_distributed",
    "put_global_batch",
]
