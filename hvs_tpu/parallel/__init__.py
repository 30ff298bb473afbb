"""Mesh construction, sharding rules, and distributed init."""

from .mesh import (
    initialize_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_sharding,
    sharded_fraction,
    DEFAULT_PARAM_RULES,
)

__all__ = [
    "sharded_fraction",
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_sharding",
    "DEFAULT_PARAM_RULES",
]
