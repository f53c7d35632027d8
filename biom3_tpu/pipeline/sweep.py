"""Large-scale generation sweep: many prompts × replicas over a device mesh.

BASELINE config #5 ("1k prompts × N samples with QC on a v5e pod"): the
(prompt × replica) grid flattens into one global batch sharded over the
mesh's (dp, fsdp) axes; every device denoises its shard under the same
compiled scan; results gather on the host for decoding/QC.  Params are
replicated (the 29-class ~50M-param Stage-3 model fits every HBM) — replica
throughput scales linearly with chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
from biom3_tpu.tokenizers.stage3_vocab import Stage3Vocab


class SweepRunner:
    def __init__(
        self,
        apply_fn,
        params,
        num_steps: int,
        mesh: Mesh,
        *,
        temperature: float = 1.0,
        chunk_steps: int | None = 128,
        positions_per_step: int = 1,
        apply_takes_positions: bool = False,
    ):
        self.mesh = mesh
        self.num_steps = num_steps
        self.vocab = Stage3Vocab()
        self.data_sharding = NamedSharding(mesh, P(("dp", "fsdp"), None))
        self.replicated = NamedSharding(mesh, P())
        self.params = jax.device_put(params, self.replicated)
        chunk = chunk_steps if chunk_steps and num_steps % (chunk_steps * positions_per_step) == 0 else None
        # apply_takes_positions=True pairs with make_sharded_stack_apply:
        # the whole-stack kernel under shard_map, one fused kernel per
        # device shard (the TPU multi-chip serving fast path)
        self.sampler = make_sampler(
            apply_fn, num_steps,
            temperature=temperature, chunk_steps=chunk,
            positions_per_step=positions_per_step,
            apply_takes_positions=apply_takes_positions,
        )
        self._shard_count = mesh.shape["dp"] * mesh.shape["fsdp"]

    def run(
        self,
        z_c_prompts: np.ndarray,
        *,
        num_replicas: int,
        seed: int = 0,
        device_batch: int = 256,
    ) -> list[list[str]]:
        """→ sequences[prompt][replica].  The (P·R) grid is processed in
        mesh-sharded slabs of ``device_batch`` rows."""
        z_c_prompts = np.atleast_2d(np.asarray(z_c_prompts, np.float32))
        P_n, D = z_c_prompts.shape
        total = P_n * num_replicas
        grid = np.repeat(z_c_prompts, num_replicas, axis=0)   # (P·R, D)

        # pad the global batch to a multiple of the shard count
        slab = max(self._shard_count, device_batch - device_batch % self._shard_count)
        key = jax.random.key(seed)
        out_ids = np.zeros((total, self.num_steps), np.int32)

        for start in range(0, total, slab):
            n = min(slab, total - start)
            n_pad = -n % self._shard_count
            zc = np.concatenate([grid[start : start + n],
                                 np.zeros((n_pad, D), np.float32)])
            key, k_path, k_samp = jax.random.split(key, 3)
            path = sample_permutations(k_path, len(zc), self.num_steps)
            zc_dev = jax.device_put(jnp.asarray(zc), self.data_sharding)
            path_dev = jax.device_put(path, self.data_sharding)
            ids = np.asarray(
                self.sampler(self.params, zc_dev, path_dev, k_samp)
            )
            out_ids[start : start + n] = ids[:n]

        decoded = [
            self.vocab.clean_sequence(self.vocab.decode_ids(row))
            for row in out_ids
        ]
        return [
            decoded[p * num_replicas : (p + 1) * num_replicas]
            for p in range(P_n)
        ]
