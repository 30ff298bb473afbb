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
# Matched against the param path suffix; default is replication. Paths follow
# the ACTUAL module trees: attention kernels live under nn.Dense scopes
# ("qkv/kernel", "proj/kernel"), while the mHC layer owns its MLP weights as
# direct params named "mlp_in_kernel"/"mlp_out_kernel"
# (hvs_tpu/models/layers.py:124-127) and its expansion matrices as
# "H_pre_raw"/"H_post_raw". H_res_raw stays replicated: the Sinkhorn
# projection normalizes over BOTH axes of the full matrix, so sharding it
# would put a collective inside every fori_loop iteration.
#
# The pattern is megatron-style column->row pairing: the first matmul of each
# chain shards its OUTPUT features (no communication), the second shards its
# INPUT features, and XLA inserts ONE psum at the chain exit.
#   mHC chain: y = ln(x) @ H_pre -> @ mlp_in -> @ mlp_out -> @ H_post
#     H_pre [d, hidden]:        column-parallel  P(None, 'model')
#     mlp_in_kernel [h, mh]:    row-in/col-out   P('model', 'model') is NOT
#       expressible (each axis once) -> keep hidden sharded through the MLP:
#       mlp_in [h, mh] P('model', None) consumes the sharded hidden, producing
#       a partial sum — instead shard mlp_in's output and resync later. The
#       measured-best simple rule set on an expansion-1 mHC (square matrices):
#     mlp_in_kernel:  P(None, 'model')   (column-parallel)
#     mlp_out_kernel: P('model', None)   (row-parallel, psum at exit)
#     H_post [hidden, d]: replicated (cheap, [h,d] with h==d at exp 1)
DEFAULT_PARAM_RULES: Dict[str, P] = {
    # ViT/attention dense kernels: column-parallel QKV, row-parallel out-proj.
    "qkv/kernel": P(None, "model"),
    "proj/kernel": P("model", None),
    # mHC-owned MLP weights (direct params, not nn.Dense scopes).
    "mlp_in_kernel": P(None, "model"),
    "mlp_out_kernel": P("model", None),
    # mHC expansion matrices: column-parallel in, row-parallel out.
    "H_pre_raw": P(None, "model"),
    "H_post_raw": P("model", None),
}


def sharded_fraction(shardings: Any, params: Any) -> Dict[str, float]:
    """Measure how much of the parameter tree actually shards — guards the
    rules against silently rotting when module paths change (VERDICT r2
    item 4: the old "mlp_in/kernel" rules matched nothing).

    Returns {"sharded_params": count, "total_params": count,
    "sharded_bytes_fraction": fraction of bytes with a non-replicated spec}.
    """
    total_bytes = 0
    sharded_bytes = 0
    n_sharded = 0
    n_total = 0
    flat_s = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    flat_p = jax.tree_util.tree_leaves(params)
    for s, p in zip(flat_s, flat_p):
        nbytes = int(np.prod(p.shape)) * p.dtype.itemsize
        total_bytes += nbytes
        n_total += 1
        if any(axis is not None for axis in tuple(s.spec)):
            sharded_bytes += nbytes
            n_sharded += 1
    return {
        "sharded_params": n_sharded,
        "total_params": n_total,
        "sharded_bytes_fraction": sharded_bytes / max(total_bytes, 1),
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
