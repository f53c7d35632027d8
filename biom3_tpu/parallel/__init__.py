from biom3_tpu.parallel.mesh import MeshConfig, make_mesh, param_partition_spec
from biom3_tpu.parallel.sharding import (
    shard_params,
    batch_sharding,
    replicated_sharding,
    params_shardings,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "param_partition_spec",
    "shard_params",
    "batch_sharding",
    "replicated_sharding",
    "params_shardings",
]
