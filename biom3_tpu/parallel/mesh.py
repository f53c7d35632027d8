"""Device-mesh construction and parameter partitioning rules.

The reference's distribution stack is NCCL DDP + DeepSpeed ZeRO
(SURVEY.md §2.2-2.4: ``dist.barrier``/``all_gather(sync_grads=True)`` in
``Stage1_source/PL_wrapper.py:989-1016``, ``DeepSpeedCPUAdam``/ZeRO-3 EMA in
Stage 3).  The TPU-native equivalent is a named ``jax.sharding.Mesh`` with
three axes:

  * ``dp``   — data parallel (batch sharding; replaces DDP),
  * ``fsdp`` — parameter/optimizer-state sharding (replaces ZeRO-3),
  * ``tp``   — tensor parallel (megatron-style FF/attention sharding; the
               reference has none, we add it for scale-out headroom).

Under ``jit`` + ``NamedSharding`` XLA inserts all collectives (all-gather for
FSDP params, psum for gradients, etc.) over ICI — barriers are implicit in
SPMD program order, and "sync_grads" all-gathers are just differentiable
array movement.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.fsdp * self.tp


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(cfg.dp, cfg.fsdp, cfg.tp)
    return Mesh(grid, ("dp", "fsdp", "tp"))


# Parameter names whose kernels are column-parallel (output-dim sharded over
# tp) vs row-parallel (input-dim sharded over tp): megatron pairing keeps the
# activation all-reduce to one per attention/FF block.
_COL_PARALLEL = re.compile(r"(to_q|to_k|to_v|ff_w1|fc1|q_proj|k_proj|v_proj)")
_ROW_PARALLEL = re.compile(r"(to_out|ff_w2|fc2|out_proj|o_proj)")


def param_partition_spec(path: str, shape: tuple, mesh: Mesh) -> P:
    """Heuristic partition spec for one parameter.

    2D kernels: fsdp on one dim + tp on the other (column- or row-parallel by
    name); embeddings fsdp-shard the vocab dim; 1D params replicate (biases
    and norms are negligible).  Dims that don't divide evenly replicate —
    correctness is unaffected (GSPMD), only layout.
    """
    fsdp_n = mesh.shape["fsdp"]
    tp_n = mesh.shape["tp"]

    def fits(dim: int, n: int) -> bool:
        return n > 1 and dim % n == 0

    if len(shape) < 2:
        return P()

    if "embedding" in path:
        return P("fsdp" if fits(shape[0], fsdp_n) else None, None)

    if len(shape) == 2:
        if _ROW_PARALLEL.search(path):
            return P(
                "tp" if fits(shape[0], tp_n) else None,
                "fsdp" if fits(shape[1], fsdp_n) else None,
            )
        # column-parallel is also the default for unmatched 2D kernels
        return P(
            "fsdp" if fits(shape[0], fsdp_n) else None,
            "tp" if fits(shape[1], tp_n) else None,
        )

    # >2D (rare): shard the last dim over tp if possible
    spec = [None] * len(shape)
    if fits(shape[-1], tp_n):
        spec[-1] = "tp"
    return P(*spec)
