"""Stage-3 inference engine: conditional sequence generation.

Mirrors ``run_ProteoScribe_sample.py`` (``batch_stage3_generate_sequences``
:60-126): for each conditioning vector z_c, generate ``num_replicas``
sequences (batched ``batch_size_sample`` at a time), decode with the
29-token table and strip markers.

TPU-native design: (prompt × replica) batches collapse into one device
batch; the whole 1024-step denoise runs as a compiled scan
(``biom3_tpu.diffusion.sampler``), vs the reference's per-step host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import Config, ProteoScribeConfig
from biom3_tpu.diffusion.sampler import (
    make_maskgit_sampler,
    make_sampler,
    sample_permutations,
)
from biom3_tpu.io.convert import proteoscribe_params_from_torch
from biom3_tpu.io.torch_load import load_torch_file
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.tokenizers.stage3_vocab import Stage3Vocab


class ProteoScribeEngine:
    def __init__(
        self,
        stage_config: Config,
        model_path: str | None = None,
        *,
        dtype=jnp.float32,
        temperature: float = 1.0,
        legacy_batch_update: bool = False,
        chunk_steps: int | None = 128,
        positions_per_step: int = 1,
        use_fused: bool | None = None,
        use_stack: bool | None = None,
        gelu: str | None = None,
        ff_quant: str | None = None,
        proj_quant: str | None = None,
        softmax_opt: bool | None = None,
        ln_onepass: bool | None = None,
        top_k: int | None = None,
        top_p: float | None = None,
        decode_order: str = "path",
        sampler_mode: str = "ardm",
        maskgit_steps: int = 16,
    ):
        self.stage_config = stage_config
        self.config = ProteoScribeConfig.from_stage_config(stage_config)
        self.model = ProteoScribe(self.config, dtype=dtype)
        self.vocab = Stage3Vocab()
        if model_path is not None:
            self.params = proteoscribe_params_from_torch(
                load_torch_file(model_path), self.config
            )
        else:
            self.params = self.model.init(
                jax.random.key(0),
                jnp.zeros((1, self.config.max_seq_len), jnp.int32),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, self.config.cond_dim)),
            )
        outer = self.config.num_timesteps // positions_per_step
        chunk = chunk_steps if chunk_steps else None
        if chunk and (chunk > outer or outer % chunk != 0):
            chunk = None
        # default TPU serving path: fused Pallas layer kernels with the
        # output head applied at the gathered positions only (~3× the
        # per-op XLA graph on-chip); the Flax graph remains the fallback
        # (CPU, f32 parity mode, legacy Q5 replay — which needs the full
        # logit grid)
        on_accel = (
            jax.devices()[0].platform not in ("cpu",)
            and dtype == jnp.bfloat16
            and not legacy_batch_update
        )
        # serving default on TPU: the whole-stack Pallas kernel (ONE kernel
        # per model call — embedding, all layers, head at the decode
        # positions; ops/pallas/stack_kernel_tpu) with tanh-GELU (deviation
        # 4.7e-4 ≪ bf16 rounding).  ``plan_stack_kernel`` gates it by shape
        # tileability and VMEM budget (weight residency auto-resolves, so
        # non-reference configs stream per layer or fall through).  The
        # per-layer fused kernels remain as ``use_stack=False``; the Flax
        # graph covers CPU, f32 parity mode, and legacy Q5 replay (which
        # needs the full logit grid).
        # confidence ordering and the MaskGIT sampler need the full logit
        # grid: the stack kernel is passed every position (gather_k = L),
        # which costs ~6 MB/row of extra VMEM at the reference shape — the
        # plan models it and falls back to the fused/Flax full-grid path
        # when it doesn't fit
        if sampler_mode not in ("ardm", "maskgit"):
            raise ValueError(f"sampler_mode must be 'ardm' or 'maskgit', "
                             f"got {sampler_mode!r}")
        if sampler_mode == "maskgit" and legacy_batch_update:
            raise ValueError("legacy_batch_update replays the reference's "
                             "sequential sampler; incompatible with maskgit")
        gather_k = (
            self.config.max_seq_len
            if decode_order == "confidence" or sampler_mode == "maskgit"
            else positions_per_step
        )
        if use_stack is None:
            from biom3_tpu.models.fused_forward import plan_stack_kernel

            use_stack = (
                on_accel
                and plan_stack_kernel(
                    self.config, gather_k=gather_k
                )["supported"]
            )
        if use_fused is None:
            use_fused = on_accel
        self.use_stack = bool(use_stack)
        self.use_fused = bool(use_fused)
        if gelu is None:
            gelu = "tanh" if self.use_stack else "erf"
        self.gelu = gelu
        # int8 MXU serving default (r3): on-chip A/B 2026-08-19
        # (tools/exp_kernels.py --which int8, B=32, 64-step scans):
        # bf16 23.09 ms/call → int8 FF+proj on the d-major stream 18.42
        # (1.25×), logit cosine > 0.999 (interpret twins) — default when
        # the whole-stack kernel serves; parity/f32/legacy paths never
        # quantize.  certify_int8 gates task quality on trained weights.
        if ff_quant is None:
            ff_quant = "int8" if self.use_stack else "none"
        if proj_quant is None:
            proj_quant = "int8" if self.use_stack else "none"
        # the dl (d-major) weight stream wins with int8 (18.42 vs 19.43
        # ms/call ld) and ties within noise in bf16; rows stays 1 (rows=2
        # +dl compiles since the 2026-08-19 backend — A/B via exp_kernels
        # --which rows2)
        stack_stream = "dl" if "int8" in (ff_quant, proj_quant) else "ld"
        self._stack_stream = stack_stream
        # exact-math VPU-pass shaving (exp2-folded local softmax + one-read
        # LayerNorms) — on-chip A/B 2026-08-19 (exp_kernels --which vpu,
        # B=32): 18.05 vs 18.48 ms/call (−2.3%); parity-gated at f32
        # tolerances in tests/test_stack_kernel.py, so it rides every
        # stack-serving mode.  Only the stack kernels implement it.
        if softmax_opt is None:
            softmax_opt = self.use_stack
        if ln_onepass is None:
            ln_onepass = self.use_stack
        self._vpu_opts = (bool(softmax_opt), bool(ln_onepass))
        apply_takes_positions = False
        if (ff_quant != "none" or proj_quant != "none") and not self.use_stack:
            raise ValueError(
                "int8 quant modes require the whole-stack serving path "
                "(bf16 on TPU with a stack-plan-supported config); "
                f"got use_stack={self.use_stack}"
            )
        if self.use_stack:
            from biom3_tpu.models.fused_forward import make_stack_apply

            apply_fn, head_fn = make_stack_apply(
                self.config, gelu=gelu, ff_quant=ff_quant,
                proj_quant=proj_quant, gather_k=gather_k,
                stream=stack_stream,
                softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
            ), None
            apply_takes_positions = True
        elif self.use_fused:
            from biom3_tpu.models.fused_forward import (
                final_head,
                make_fused_apply,
            )

            apply_fn = make_fused_apply(
                self.config, return_hidden=True, gelu=gelu
            )
            head_fn = lambda v, h: final_head(
                self.config, v["params"] if "params" in v else v, h
            )
        else:
            apply_fn, head_fn = self.model.apply, None
        self._sampler_cfg = dict(
            temperature=temperature,
            chunk_steps=chunk,
            positions_per_step=positions_per_step,
            top_k=top_k,
            top_p=top_p,
            order=decode_order,
        )
        self._gather_k = gather_k
        self._sampler_mode = sampler_mode
        self._maskgit_steps = maskgit_steps
        self._chunk_steps_arg = chunk_steps
        self._quant = (ff_quant, proj_quant)
        # the raw apply contract, for samplers built after init (the
        # continuous-batching chunk stepper shares the serving kernel)
        self._apply_fn = apply_fn
        self._head_fn = head_fn
        self._takes_positions = apply_takes_positions
        self._legacy = legacy_batch_update
        self._inpainter = None
        self._mesh_params_cache: dict[int, object] = {}
        if sampler_mode == "maskgit":
            self.sampler = make_maskgit_sampler(
                apply_fn, self.config.max_seq_len, steps=maskgit_steps,
                temperature=temperature, top_k=top_k, top_p=top_p,
                head_fn=head_fn, apply_takes_positions=apply_takes_positions,
            )
        else:
            self.sampler = make_sampler(
                apply_fn,
                self.config.num_timesteps,
                legacy_batch_update=legacy_batch_update,
                head_fn=head_fn,
                apply_takes_positions=apply_takes_positions,
                **self._sampler_cfg,
            )

    def make_sharded_sampler(self, mesh, *, interpret: bool = False):
        """Multi-chip serving backend: the whole-stack kernel under
        ``shard_map`` over the mesh's (dp, fsdp) batch axes (params
        replicated — denoising is embarrassingly batch-parallel, no
        collectives).  Returns ``sample_rows(z_c (B, C), key) → (B, L)``
        with ``sample_batch`` semantics; B must be a multiple of
        dp·fsdp.  ``interpret=True`` runs the kernel in Pallas interpret
        mode (CPU-mesh tests).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from biom3_tpu.models.fused_forward import make_sharded_stack_apply

        ff_quant, proj_quant = self._quant
        apply_fn = make_sharded_stack_apply(
            self.config, mesh, gelu=self.gelu, interpret=interpret,
            dtype=jnp.float32 if interpret else jnp.bfloat16,
            gather_k=self._gather_k,
            ff_quant=ff_quant, proj_quant=proj_quant,
            stream=self._stack_stream,
            softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
        )
        if self._sampler_mode == "maskgit":
            cfg = self._sampler_cfg
            sampler = make_maskgit_sampler(
                apply_fn, self.config.max_seq_len,
                steps=self._maskgit_steps, temperature=cfg["temperature"],
                top_k=cfg["top_k"], top_p=cfg["top_p"],
                apply_takes_positions=True,
            )
        else:
            sampler = make_sampler(
                apply_fn, self.config.num_timesteps,
                apply_takes_positions=True, **self._sampler_cfg,
            )
        data = NamedSharding(mesh, P(("dp", "fsdp"), None))
        params = self._replicated_params(mesh)
        shards = mesh.shape["dp"] * mesh.shape["fsdp"]

        def sample_rows(z_c: np.ndarray, key: jax.Array) -> np.ndarray:
            B = z_c.shape[0]
            if B % shards:
                raise ValueError(f"batch {B} not divisible by {shards} "
                                 "mesh shards")
            key, sub = jax.random.split(key)
            path = sample_permutations(sub, B, self.config.max_seq_len)
            zc = jax.device_put(jnp.asarray(z_c, jnp.float32), data)
            pd = jax.device_put(path, data)
            return np.asarray(sampler(params, zc, pd, key))

        return sample_rows

    @property
    def sampler_mode(self) -> str:
        """``"ardm"`` or ``"maskgit"`` (the serving scheduler keys on it)."""
        return self._sampler_mode

    def make_trajectory_row_fn(self, mesh=None, *, interpret: bool = False):
        """Non-fetching dispatch function for the row-granular packed
        scheduler (``serving/trajectory.TrajectoryBatcher``).

        Returns ``(row_fn, accepts_masked)`` where
        ``row_fn(z_c (B, C) np, key, masked=None) → (B, L) DEVICE ids``
        enqueues one whole-trajectory dispatch and returns without
        fetching — the scheduler overlaps the fetch/decode of dispatch
        N−1 with dispatch N's execution (depth-1 pipelining, the
        continuous scheduler's policy applied to trajectory-complete fast
        modes).  ``accepts_masked=True`` (maskgit) means inpaint rows
        (partially revealed ``masked`` ids, absorbing 0 at the fill
        positions) may share a dispatch with generate rows (x0 = zeros) —
        both resume the SAME compiled executable
        (``diffusion/sampler.make_maskgit_sampler``'s ``run``).

        Key handling matches ``sample_batch`` (one split before the
        sampler call), so a seeded solo GENERATE dispatch reproduces the
        legacy request-granular scheduler bit-for-bit; merged maskgit
        inpaint rows get the generate stream (``inpaint_batch`` passes
        the raw key — a different stream, same distribution).
        """
        if mesh is None:
            sampler, params, data = self.sampler, self.params, None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from biom3_tpu.models.fused_forward import make_sharded_stack_apply

            ff_quant, proj_quant = self._quant
            apply_fn = make_sharded_stack_apply(
                self.config, mesh, gelu=self.gelu, interpret=interpret,
                dtype=jnp.float32 if interpret else jnp.bfloat16,
                gather_k=(self.config.max_seq_len
                          if self._sampler_mode == "maskgit"
                          else self._gather_k),
                ff_quant=ff_quant, proj_quant=proj_quant,
                stream=self._stack_stream,
                softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
            )
            cfg = self._sampler_cfg
            if self._sampler_mode == "maskgit":
                sampler = make_maskgit_sampler(
                    apply_fn, self.config.max_seq_len,
                    steps=self._maskgit_steps, temperature=cfg["temperature"],
                    top_k=cfg["top_k"], top_p=cfg["top_p"],
                    apply_takes_positions=True,
                )
            else:
                sampler = make_sampler(
                    apply_fn, self.config.num_timesteps,
                    apply_takes_positions=True, **cfg,
                )
            params = self._replicated_params(mesh)
            data = NamedSharding(mesh, P(("dp", "fsdp"), None))

        L = self.config.max_seq_len

        def put(a, dtype):
            a = jnp.asarray(a, dtype)
            return a if data is None else jax.device_put(a, data)

        if self._sampler_mode == "maskgit":
            def row_fn(z_c, key, masked=None):
                # sample_batch splits once (its ignored path draw)
                # before the sampler sees the key — mirror it so seeded
                # generate dispatches match the legacy scheduler
                key = jax.random.split(key)[0]
                zc = put(z_c, jnp.float32)
                x0 = (jnp.zeros((zc.shape[0], L), jnp.int32)
                      if masked is None else put(masked, jnp.int32))
                return sampler(params, zc, None, key, x0=x0)

            return row_fn, True

        def row_fn(z_c, key, masked=None):
            if masked is not None:
                raise ValueError("ardm trajectory dispatches cannot carry "
                                 "inpaint rows (separate executable)")
            key, sub = jax.random.split(key)
            paths = sample_permutations(sub, z_c.shape[0], L)
            return sampler(params, put(z_c, jnp.float32),
                           put(paths, jnp.int32), key)

        return row_fn, False

    def supports_continuous_stepping(self) -> bool:
        """True when the engine's serving math can run under the
        chunk-boundary continuous batcher: exact path-order ARDM without
        the Q5 legacy replay.  MaskGIT/blocked-confidence modes finish in
        ~16 forwards — trajectory-start packing already saturates them."""
        return (
            self._sampler_mode == "ardm"
            and self._sampler_cfg["order"] == "path"
            and not self._legacy
        )

    def make_continuous_stepper(self, mesh=None, *, interpret: bool = False):
        """Build the per-row-offset chunk stepper for continuous serving
        (``diffusion.sampler.make_chunk_stepper`` over this engine's
        serving apply contract — same kernel, same quant modes).

        Returns ``(chunk_fn, meta)`` where meta carries ``chunk_steps``,
        ``positions_per_step``, ``num_steps``, the params to pass (mesh-
        replicated under a mesh) and the batch-data sharding (or None).
        """
        if not self.supports_continuous_stepping():
            raise ValueError(
                "continuous stepping needs exact path-order ARDM "
                f"(sampler_mode={self._sampler_mode!r}, "
                f"order={self._sampler_cfg['order']!r}, "
                f"legacy_batch_update={self._legacy})"
            )
        from biom3_tpu.diffusion.sampler import make_chunk_stepper

        cfg = self._sampler_cfg
        k = cfg["positions_per_step"]
        outer = self.config.num_timesteps // k
        chunk = cfg["chunk_steps"] or outer
        data = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from biom3_tpu.models.fused_forward import make_sharded_stack_apply

            ff_quant, proj_quant = self._quant
            apply_fn = make_sharded_stack_apply(
                self.config, mesh, gelu=self.gelu, interpret=interpret,
                dtype=jnp.float32 if interpret else jnp.bfloat16,
                gather_k=self._gather_k,
                ff_quant=ff_quant, proj_quant=proj_quant,
                stream=self._stack_stream,
                softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
            )
            head_fn, takes_positions = None, True
            params = self._replicated_params(mesh)
            data = NamedSharding(mesh, P(("dp", "fsdp"), None))
        else:
            apply_fn, head_fn = self._apply_fn, self._head_fn
            takes_positions = self._takes_positions
            params = self.params
        chunk_fn = make_chunk_stepper(
            apply_fn, self.config.num_timesteps,
            chunk_steps=chunk, positions_per_step=k,
            temperature=cfg["temperature"],
            top_k=cfg["top_k"], top_p=cfg["top_p"],
            head_fn=head_fn, apply_takes_positions=takes_positions,
        )
        meta = {
            "chunk_steps": chunk,
            "positions_per_step": k,
            "num_steps": self.config.num_timesteps,
            "params": params,
            "data_sharding": data,
        }
        return chunk_fn, meta

    def _replicated_params(self, mesh):
        """Params replicated over ``mesh``, cached per mesh — the sharded
        sampler and inpainter share ONE copy instead of each device_put
        doubling the replicated HBM footprint."""
        key = id(mesh)
        if key not in self._mesh_params_cache:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._mesh_params_cache[key] = jax.device_put(
                self.params, NamedSharding(mesh, P())
            )
        return self._mesh_params_cache[key]

    def make_sharded_inpainter(self, mesh, *, interpret: bool = False):
        """Multi-chip inpainting backend, mirroring ``make_sharded_sampler``:
        the whole-stack kernel under ``shard_map`` over the mesh's (dp,
        fsdp) batch axes feeding a confidence-order inpainter (or, in
        maskgit mode, the parallel sampler resuming from the partial
        sequence).  Returns ``inpaint_rows(masked (B, L), z_c (B, C), key)
        → (B, L)`` with ``inpaint_batch`` semantics; B must be a multiple
        of dp·fsdp.

        Inpainting needs the full logit grid (gather_k = L); when the
        config's plan rejects that wider gather the single-device
        ``inpaint_batch`` path (with its own Flax fallback) is returned
        instead of failing — the mesh keeps serving ``generate`` sharded
        and inpaint degrades to one device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from biom3_tpu.diffusion.inpainting import make_inpainter
        from biom3_tpu.models.fused_forward import (
            make_sharded_stack_apply,
            plan_stack_kernel,
        )

        L = self.config.max_seq_len
        if not interpret and not plan_stack_kernel(
            self.config, gather_k=L
        )["supported"]:
            return self.inpaint_batch
        ff_quant, proj_quant = self._quant
        apply_fn = make_sharded_stack_apply(
            self.config, mesh, gelu=self.gelu, interpret=interpret,
            dtype=jnp.float32 if interpret else jnp.bfloat16,
            gather_k=L,
            ff_quant=ff_quant, proj_quant=proj_quant,
            stream=self._stack_stream,
            softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
        )
        temperature = self._sampler_cfg["temperature"]
        if self._sampler_mode == "maskgit":
            sampler = make_maskgit_sampler(
                apply_fn, L, steps=self._maskgit_steps,
                temperature=temperature,
                top_k=self._sampler_cfg["top_k"],
                top_p=self._sampler_cfg["top_p"],
                apply_takes_positions=True,
            )
            run = lambda params, masked, zc, key: sampler(
                params, zc, None, key, x0=masked
            )
        else:
            chunk = self._chunk_steps_arg
            if chunk and (chunk > L or L % chunk != 0):
                chunk = None
            inpaint = make_inpainter(
                apply_fn, L, temperature=temperature,
                apply_takes_positions=True, chunk_steps=chunk,
                order="confidence", early_exit=chunk is not None,
                top_k=self._sampler_cfg["top_k"],
                top_p=self._sampler_cfg["top_p"],
            )
            run = lambda params, masked, zc, key: inpaint(
                params, masked, zc,
                jnp.zeros(masked.shape, jnp.int32),
                jnp.zeros((masked.shape[0],), jnp.int32), key,
            )
        data = NamedSharding(mesh, P(("dp", "fsdp"), None))
        params = self._replicated_params(mesh)
        shards = mesh.shape["dp"] * mesh.shape["fsdp"]

        def inpaint_rows(masked_ids: np.ndarray, z_c: np.ndarray,
                         key: jax.Array) -> np.ndarray:
            B = masked_ids.shape[0]
            if B % shards:
                raise ValueError(f"batch {B} not divisible by {shards} "
                                 "mesh shards")
            masked = jax.device_put(jnp.asarray(masked_ids, jnp.int32), data)
            zc = jax.device_put(jnp.asarray(z_c, jnp.float32), data)
            return np.asarray(run(params, masked, zc, key))

        return inpaint_rows

    def _get_inpainter(self):
        """Compiled confidence-order inpainter over the engine's serving
        path (built on first use; `diffusion/inpainting.py:make_inpainter`).

        Confidence order is the certified default (PARITY.md: dominates
        random order in every cell) and lets ``early_exit`` bound the cost
        at one step per masked position.  The whole-stack kernel needs the
        full logit grid here (gather_k = L); when the engine was built
        with a narrower gather (path-order ARDM serving) a dedicated
        stack apply is constructed, falling back to the Flax graph when
        the plan rejects the wider gather or the engine isn't on the
        stack path.
        """
        if self._inpainter is not None:
            return self._inpainter
        from biom3_tpu.diffusion.inpainting import make_inpainter

        L = self.config.max_seq_len
        apply_fn, takes_positions = self.model.apply, False
        if self.use_stack:
            from biom3_tpu.models.fused_forward import (
                make_stack_apply,
                plan_stack_kernel,
            )

            if plan_stack_kernel(self.config, gather_k=L)["supported"]:
                ff_quant, proj_quant = self._quant
                apply_fn = make_stack_apply(
                    self.config, gelu=self.gelu, ff_quant=ff_quant,
                    proj_quant=proj_quant, gather_k=L,
                    stream=self._stack_stream,
                    softmax_opt=self._vpu_opts[0],
                    ln_onepass=self._vpu_opts[1],
                )
                takes_positions = True
        chunk = self._chunk_steps_arg
        if chunk and (chunk > L or L % chunk != 0):
            chunk = None
        self._inpainter = make_inpainter(
            apply_fn,
            L,
            temperature=self._sampler_cfg["temperature"],
            apply_takes_positions=takes_positions,
            chunk_steps=chunk,
            order="confidence",
            early_exit=chunk is not None,
            top_k=self._sampler_cfg["top_k"],
            top_p=self._sampler_cfg["top_p"],
        )
        return self._inpainter

    def inpaint_batch(
        self,
        masked_ids: np.ndarray,
        z_c: np.ndarray,
        key: jax.Array,
    ) -> np.ndarray:
        """Fill the absorbing-state (0) positions of ``masked_ids`` (B, L)
        conditioned on ``z_c`` (B, cond_dim); committed ids never change.

        Ports the reference's resume-from-corruption surface
        (``Stage3_source/sampling_analysis.py:21-61,96-147``) to a serving
        entrypoint: encode user sequences with
        ``Stage3Vocab.encode_partial``, fill here, decode as usual.  In
        ``sampler_mode="maskgit"`` the parallel sampler resumes from the
        partial sequence directly (S forwards); otherwise a compiled
        confidence-order inpainter decodes one position per step with
        chunked early exit.
        """
        masked = jnp.asarray(masked_ids, jnp.int32)
        zc = jnp.asarray(z_c, jnp.float32)
        if self._sampler_mode == "maskgit":
            return np.asarray(
                self.sampler(self.params, zc, None, key, x0=masked)
            )
        inpaint = self._get_inpainter()
        B, L = masked.shape
        # confidence order ignores path/t0 (ordering comes off the
        # absorbing state); placeholders keep the signature uniform
        path = jnp.zeros((B, L), jnp.int32)
        t0 = jnp.zeros((B,), jnp.int32)
        return np.asarray(inpaint(self.params, masked, zc, path, t0, key))

    def sample_batch(
        self,
        z_c: np.ndarray,
        key: jax.Array,
        *,
        paths: np.ndarray | None = None,
    ) -> np.ndarray:
        """z_c (B, cond_dim) → (B, L) decode-table ids.  ``paths`` may inject
        externally-generated permutations (parity replay support)."""
        B = z_c.shape[0]
        if paths is None:
            key, sub = jax.random.split(key)
            paths = sample_permutations(sub, B, self.config.max_seq_len)
        return np.asarray(
            self.sampler(
                self.params, jnp.asarray(z_c, jnp.float32),
                jnp.asarray(paths, jnp.int32), key,
            )
        )

    def generate_sequences(
        self,
        z_c_all: np.ndarray,
        *,
        num_replicas: int | None = None,
        batch_size: int | None = None,
        seed: int = 0,
    ) -> dict:
        """Reference CLI semantics: dict of replica → list of cleaned
        sequences per prompt (run_ProteoScribe_sample.py:94-126)."""
        cfg = self.stage_config
        num_replicas = num_replicas or cfg.int("num_replicas", 5)
        batch_size = batch_size or cfg.int("batch_size_sample", 32)
        z_c_all = np.atleast_2d(np.asarray(z_c_all, np.float32))

        out = {f"replica_{i}": [] for i in range(num_replicas)}
        key = jax.random.key(seed)
        for z in z_c_all:
            for start in range(0, num_replicas, batch_size):
                n = min(batch_size, num_replicas - start)
                key, sub = jax.random.split(key)
                ids = self.sample_batch(np.tile(z[None, :], (n, 1)), sub)
                for i in range(n):
                    seq = self.vocab.clean_sequence(self.vocab.decode_ids(ids[i]))
                    out[f"replica_{start + i}"].append(seq)
        return out
