"""Multi-host initialization for pod slices (ICI within a slice, DCN across).

The reference's multi-node story is Slurm + NCCL env plumbing
(README.md:76-82).  On TPU pods, ``jax.distributed.initialize()`` picks up
the cluster topology from the TPU environment automatically; this wrapper
adds explicit-coordinator fallback (GPU-style clusters / CPU testing) and a
mesh helper that keeps the fsdp/tp axes inside a slice (ICI) and dp across
slices (DCN) — the layout SURVEY.md §2.3 prescribes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from biom3_tpu.parallel.mesh import MeshConfig


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods all arguments auto-detect."""
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_hybrid_mesh(cfg: MeshConfig) -> Mesh:
    """Mesh whose dp axis maps across hosts/slices (DCN) and fsdp/tp inside
    a slice (ICI), using JAX's topology-aware device ordering."""
    try:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh

        grid = create_hybrid_device_mesh(
            mesh_shape=(cfg.fsdp, cfg.tp),
            dcn_mesh_shape=(cfg.dp, 1),
            devices=jax.devices(),
        ).reshape(cfg.dp, cfg.fsdp, cfg.tp)
    except Exception:
        # single-host / test fallback: plain ordering
        grid = np.asarray(jax.devices()[: cfg.num_devices]).reshape(
            cfg.dp, cfg.fsdp, cfg.tp
        )
    return Mesh(grid, ("dp", "fsdp", "tp"))
