"""Mesh construction, sharding rules, and distributed init."""

from .mesh import (
    initialize_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    param_sharding,
    DEFAULT_PARAM_RULES,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_sharding",
    "DEFAULT_PARAM_RULES",
]
