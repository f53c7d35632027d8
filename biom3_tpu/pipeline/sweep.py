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


class Stage1SweepRunner:
    """Mesh-sharded bulk embedding: many (caption, sequence) pairs through
    the fused tower kernels, batch sharded over (dp, fsdp).

    The production counterpart of the reference's one-GPU
    ``run_PenCL_inference.py`` loop: each device runs the whole-tower
    Pallas kernels (``esm2_stack_tpu`` / ``bert_stack_tpu``, incl. the
    int8-FF serving mode) on its shard — no collectives, linear scale-out.
    Pass ``interpret=True`` only for CPU-mesh tests.
    """

    def __init__(self, engine, mesh: Mesh, *, device_batch: int = 64,
                 interpret: bool = False):
        from biom3_tpu.models.pencl import ProjectionHead
        from biom3_tpu.ops.pallas.bert_stack_tpu import (
            bert_embed,
            fused_bert_cls,
        )
        from biom3_tpu.ops.pallas.esm2_stack_tpu import fused_esm2_cls

        if engine._stack_arrays is None or "esm" not in engine._stack_arrays:
            raise ValueError(
                "Stage1SweepRunner needs a fused-stack engine with BOTH "
                "towers (tower_impl='fused-stack', text_only=False) — "
                "text_only engines build only the BERT arrays"
            )
        self.engine = engine
        self.mesh = mesh
        self.device_batch = device_batch
        self._shard_count = mesh.shape["dp"] * mesh.shape["fsdp"]
        self.data_sharding = NamedSharding(mesh, P(("dp", "fsdp"), None))
        cfg = engine.config
        dtype = engine.model.dtype
        proj = ProjectionHead(cfg.proj_dim, cfg.dropout, dtype)
        params, arrays = engine.params, engine._stack_arrays

        def pair(x_t, x_p):
            p = params["params"]
            x0 = bert_embed(p["text_encoder"], x_t, dtype=dtype)
            t_cls = fused_bert_cls(
                x0, **arrays["bert"], heads=cfg.bert.num_heads, gelu="tanh",
                rows=1, ff_quant=engine.bert_ff_quant,
                proj_quant=engine.bert_proj_quant, interpret=interpret,
            )
            z_t = proj.apply({"params": p["text_projection"]},
                             t_cls.astype(dtype))
            cls = fused_esm2_cls(
                x_p, **arrays["esm"], heads=cfg.esm.attention_heads,
                gelu="tanh", ff_quant=engine.ff_quant,
                proj_quant=engine.proj_quant, interpret=interpret,
            )
            z_p = proj.apply({"params": p["protein_projection"]},
                             cls.astype(dtype))
            return z_t, z_p

        self._pair = jax.jit(jax.shard_map(
            pair, mesh=mesh,
            in_specs=(P(("dp", "fsdp")), P(("dp", "fsdp"))),
            out_specs=(P(("dp", "fsdp")), P(("dp", "fsdp"))),
            check_vma=False,
        ))

    def run(self, x_t: np.ndarray, x_p: np.ndarray):
        """Token batches (N, Lt) / (N, Lp) → (z_t, z_p) (N, proj_dim)."""
        N = x_t.shape[0]
        slab = max(self._shard_count,
                   self.device_batch - self.device_batch % self._shard_count)
        zts, zps = [], []
        for start in range(0, N, slab):
            n = min(slab, N - start)
            n_pad = -n % self._shard_count
            xt = np.concatenate(
                [x_t[start:start + n],
                 np.zeros((n_pad, x_t.shape[1]), x_t.dtype)])
            xp = np.concatenate(
                [x_p[start:start + n],
                 np.ones((n_pad, x_p.shape[1]), x_p.dtype)])
            zt, zp = self._pair(
                jax.device_put(jnp.asarray(xt), self.data_sharding),
                jax.device_put(jnp.asarray(xp), self.data_sharding),
            )
            zts.append(np.asarray(zt, np.float32)[:n])
            zps.append(np.asarray(zp, np.float32)[:n])
        return np.concatenate(zts), np.concatenate(zps)
