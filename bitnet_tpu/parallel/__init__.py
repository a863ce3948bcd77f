"""Multi-chip parallelism: mesh, shardings, sharded engine helpers."""

from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, single_device_mesh
from .multihost import host_mesh, init_distributed
from .sharding import (
    cache_pspecs,
    param_pspecs,
    shard_cache,
    shard_params,
    token_pspec,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "single_device_mesh",
    "cache_pspecs",
    "param_pspecs",
    "shard_cache",
    "shard_params",
    "token_pspec",
]
