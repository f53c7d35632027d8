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


def shard_params(params, mesh: Mesh):
    """Device_put params onto the mesh according to the partition rules."""
    return jax.device_put(params, params_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch arrays: leading dim over (dp, fsdp) — fsdp acts as a second
    data axis for activations (ZeRO semantics), rest replicated."""
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
