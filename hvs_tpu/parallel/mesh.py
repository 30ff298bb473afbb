"""Device meshes and sharding rules — the TPU-native replacement for
DDP/NCCL/DistributedSampler.

The reference's only parallelism is data parallelism over NCCL
(reference: scripts/train.py:34-49,200-207; src/data/dataloader.py:330-377;
SURVEY.md §2.11). Here the same strategy — plus an optional model axis for
tensor-parallel scale-up — is expressed as a ``jax.sharding.Mesh``:

  * batch axis sharded over ``data`` — gradient all-reduce becomes an XLA
    ``psum`` riding ICI inside a slice, DCN across slices, no hand-written
    collectives;
  * params/optimizer state replicated (or sharded over ``model`` when a rule
    matches);
  * host data loading feeds per-process shards via
    ``jax.make_array_from_process_local_data`` (multi-host) or a single
    ``device_put`` (single-host).

``jax.distributed.initialize`` handles multi-host rendezvous (replacing the
reference's env:// NCCL process group).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (replaces dist.init_process_group, scripts/train.py:34-49).

    No-ops on a single host; on TPU pods the arguments come from the
    environment automatically.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices.

    Defaults to pure data parallelism (n_model=1) — the reference's strategy.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch axis sharded over 'data'.

    Replaces DistributedSampler: every process loads its local slice and the
    global array is assembled across processes.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


# Sharding rules for tensor-parallel param layouts (optional 'model' axis).
# Matched longest-suffix-first against the param path; default is replication.
DEFAULT_PARAM_RULES: Dict[str, P] = {
    # ViT/attention dense kernels: shard the output features.
    "qkv/kernel": P(None, "model"),
    "proj/kernel": P("model", None),
    "mlp_in/kernel": P(None, "model"),
    "mlp_out/kernel": P("model", None),
}


def param_sharding(
    mesh: Mesh, params: Any, rules: Optional[Dict[str, P]] = None
) -> Any:
    """Build a sharding tree for params: replicate unless a rule matches.

    With n_model == 1 every spec collapses to full replication, so the same
    code path serves pure-DP and TP meshes.
    """
    rules = DEFAULT_PARAM_RULES if rules is None else rules
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(keys)
        if model_size > 1:
            for suffix, spec in rules.items():
                if joined.endswith(suffix):
                    # Only shard if the dimension divides evenly.
                    dims = [d for d in spec]
                    ok = all(
                        leaf.shape[i] % model_size == 0
                        for i, d in enumerate(dims)
                        if d == "model"
                    )
                    if ok and len(dims) == leaf.ndim:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
