"""Sharding helpers: apply partition rules to pytrees and batches."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from biom3_tpu.parallel.mesh import param_partition_spec


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def params_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``param_partition_spec`` rules."""

    def spec_for(path, leaf):
        return NamedSharding(
            mesh, param_partition_spec(_path_str(path), leaf.shape, mesh)
        )

    return jax.tree_util.tree_map_with_path(spec_for, params)


def put_global(value, sharding: NamedSharding):
    """Place a host-global array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``.  Multi-process (pod slices /
    ``jax.distributed``): every process holds the same host-global value —
    the SPMD analogue of the reference feeding identical DataLoader shards
    per rank (Stage1_source/PL_wrapper.py:989-1016) — and each process
    materializes only its addressable shards via ``make_array_from_callback``
    (``device_put`` cannot target non-addressable devices).
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    import numpy as np

    host = np.asarray(value)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def shard_params(params, mesh: Mesh):
    """Place params onto the mesh according to the partition rules."""
    return jax.tree_util.tree_map(put_global, params, params_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch arrays: leading dim over (dp, fsdp) — fsdp acts as a second
    data axis for activations (ZeRO semantics), rest replicated."""
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
