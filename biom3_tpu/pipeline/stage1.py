"""Stage-1 inference engine: PenCL embeddings + similarity scoring.

Mirrors ``run_PenCL_inference.py`` (main :83-166) but batched: the reference
runs the 5-pair demo one item at a time (SURVEY.md Q11); here tokenized
batches stream to the device and both towers run under one jit.  Scoring
(dot products, two softmax normalizations, norms, homology matrix) is fused
on device (``compute_scores``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import Config, PenCLConfig
from biom3_tpu.io.convert_stage1 import pencl_params_from_torch
from biom3_tpu.io.torch_load import load_torch_file
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.tokenizers.esm_alphabet import ESMAlphabet


@jax.jit
def compute_scores(z_p: jax.Array, z_t: jax.Array) -> dict:
    """The reference CLI's printed score set (run_PenCL_inference.py:132-144)."""
    dot = z_p @ z_t.T
    z_p_n = z_p / jnp.linalg.norm(z_p, axis=1, keepdims=True)
    return {
        "dot_product_scores": dot,
        "protein_given_text_probs": jax.nn.softmax(dot, axis=0),
        "text_given_protein_probs": jax.nn.softmax(dot, axis=1),
        "z_p_magnitude": jnp.linalg.norm(z_p, axis=1),
        "z_t_magnitude": jnp.linalg.norm(z_t, axis=1),
        "homology_matrix": z_p_n @ z_p_n.T,
    }


class PenCLEngine:
    def __init__(
        self,
        stage_config: Config,
        model_path: str | None = None,
        *,
        dtype=jnp.float32,
        text_tokenizer=None,
        text_only: bool = False,
        attn_impl: str | None = None,
        tower_impl: str | None = None,
        ff_quant: str | None = None,
        proj_quant: str | None = None,
        bert_ff_quant: str | None = None,
        bert_proj_quant: str | None = None,
        softmax_opt: bool | None = None,
        ln_onepass: bool | None = None,
    ):
        self.stage_config = stage_config
        self.config = PenCLConfig.from_stage_config(stage_config)
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        perf_mode = on_tpu and dtype == jnp.bfloat16
        if attn_impl is None:
            # measured TPU serving defaults (tools/exp_tower_attn.py):
            # single-pass flash kernel beats XLA attention 51.4 vs 46.6
            # pairs/s in bf16, and tanh-GELU saves another 366 ms/fwd; the
            # f32 parity path keeps XLA + erf (bit-parity reference)
            attn_impl = "pallas:1024:1024" if perf_mode else "xla"
        if tower_impl is None:
            # whole-tower streamed-weights kernel (ops/pallas/esm2_stack_tpu)
            # is the bf16 serving default — measured on-chip A/B in
            # tools/exp_esm2_stack.py; f32 parity keeps the Flax graph
            tower_impl = "fused-stack" if perf_mode else "flax"
        if ff_quant is None:
            # int8 FF (per-row dynamic activation x per-channel weight quant,
            # int32 MXU) — on-chip A/B tools/exp_esm2_stack.py: 126.9 vs
            # 100.9 seq/s tower-only, CLS cosine 0.999939 vs the XLA path;
            # drift-gated >0.999 in bench and test_esm2_stack's CPU twin
            ff_quant = "int8" if perf_mode else "none"
        self.ff_quant = ff_quant
        # int8 ESM2 q/k/v/out projections + int8 BERT FF: pair-level on-chip
        # A/B (tools/exp_pencl_quant.py, 2026-08-19, B=16): full combo 125.4
        # pairs/s vs 108.8 (ff-only) vs 94.5 (bf16), min embedding cosine
        # 0.999980 vs the erf/XLA graph — serving defaults in perf mode;
        # parity mode keeps full bf16/f32
        if proj_quant is None:
            proj_quant = "int8" if perf_mode else "none"
        if bert_ff_quant is None:
            bert_ff_quant = "int8" if perf_mode else "none"
        # BERT q/k/v/out int8 (post-LN tower — the quantized activation is
        # the raw residual): on-chip pair A/B (exp_pencl_quant --bert-proj,
        # B=32, 2026-08-19): 127.9 vs 126.3 pairs/s, min embedding cosine
        # unchanged (0.999980) — perf-mode default; drift-gated in
        # test_bert_stack.py's interpret twin
        if bert_proj_quant is None:
            bert_proj_quant = "int8" if perf_mode else "none"
        self.proj_quant = proj_quant
        self.bert_ff_quant = bert_ff_quant
        self.bert_proj_quant = bert_proj_quant
        # exact-math VPU-pass shaving in the tower stack kernels
        # (exp2-folded softmax via wq/bq, one-read LayerNorms) — parity
        # tests in test_{esm2,bert}_stack.py.  Default OFF: the on-chip
        # pair A/B is mildly NEGATIVE here (exp_pencl_quant --vpu, B=32,
        # 2026-08-19: 125.1 vs 127.1 pairs/s) — the dense towers are
        # MXU-bound, so shaving VPU passes only perturbs the schedule
        # (unlike the Stage-3 stack's small-strip local attention, where
        # it wins — see pipeline/stage3.py).
        if softmax_opt is None:
            softmax_opt = False
        if ln_onepass is None:
            ln_onepass = False
        self._vpu_opts = (bool(softmax_opt), bool(ln_onepass))
        self.tower_impl = tower_impl
        # one gelu for the Flax graph AND the fused-stack kernels: parity
        # mode (f32) keeps erf everywhere — a fused-stack engine forced
        # into parity mode must not silently drift from PenCL.encode_text
        self.gelu = "tanh" if perf_mode else "erf"
        self.model = PenCL(
            self.config, dtype=dtype, attn_impl=attn_impl, gelu=self.gelu,
        )
        self.alphabet = ESMAlphabet()
        self._text_tokenizer = text_tokenizer

        if model_path is not None:
            self.params = pencl_params_from_torch(
                load_torch_file(model_path), self.config, text_only=text_only
            )
        else:
            self.params = self.model.init(
                jax.random.key(0),
                jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 8), jnp.int32),
                method=PenCL.init_all_params,
            )
        self._forward = jax.jit(
            lambda p, x_t, x_p: self.model.apply(p, x_t, x_p)
        )
        self._encode_text = jax.jit(
            lambda p, x: self.model.apply(p, x, method=PenCL.encode_text)
        )
        self._stack_arrays = None
        # engines forced onto the fused path on CPU (tests) run the
        # interpret twins; real chips run the Mosaic kernels
        self._kernel_interpret = not on_tpu
        if tower_impl == "fused-stack":
            # text_only engines still get the fused BERT tower: embed_text
            # is the e2e/sweep serving path, and the Flax graph measured
            # far slower there (r4 sweep: the embed phase dominated)
            from biom3_tpu.models.pencl import ProjectionHead
            from biom3_tpu.ops.pallas.bert_stack_tpu import bert_stack_arrays

            self._stack_arrays = {
                "bert": bert_stack_arrays(
                    self.params["params"]["text_encoder"],
                    self.config.bert.num_layers, dtype=dtype,
                    ff_quant=self.bert_ff_quant,
                    proj_quant=self.bert_proj_quant,
                ),
            }
            if not text_only:
                from biom3_tpu.ops.pallas.esm2_stack_tpu import (
                    esm2_stack_arrays,
                )

                self._stack_arrays["esm"] = esm2_stack_arrays(
                    self.params["params"]["protein_encoder"],
                    self.config.esm.num_layers, dtype=dtype,
                    ff_quant=self.ff_quant, proj_quant=self.proj_quant,
                )
            proj = ProjectionHead(self.config.proj_dim, self.config.dropout,
                                  dtype)
            self._proj_head = jax.jit(
                lambda head_params, cls: proj.apply(
                    {"params": head_params}, cls
                )
            )

    @property
    def text_tokenizer(self):
        if self._text_tokenizer is None:
            from biom3_tpu.tokenizers.text import TextTokenizer

            self._text_tokenizer = TextTokenizer(
                self.stage_config.text_model_path,
                max_length=self.config.text_max_length,
            )
        return self._text_tokenizer

    def tokenize(self, captions: list[str], sequences: list[str]) -> tuple:
        from biom3_tpu import native

        x_t = self.text_tokenizer.batch_encode(captions)["input_ids"]
        # native C++ encoder when available (identical output, ~20× faster)
        x_p = native.esm_batch_encode(sequences, pad_to=self.config.seq_max_length)
        return x_t, x_p

    def embed_text(self, captions: list[str], batch_size: int = 32) -> np.ndarray:
        """Text-only z_t (skips the 650M protein tower; e2e pipeline path).

        Rides the fused whole-tower BERT kernel when the engine is on the
        fused-stack path (incl. ``text_only=True`` engines, r4) — same
        math as ``PenCL.encode_text`` (CLS hidden → projection), drift-
        gated by the interpret twins in tests/test_bert_stack.py."""
        outs = []
        for i in range(0, len(captions), batch_size):
            x_t = self.text_tokenizer.batch_encode(captions[i : i + batch_size])
            ids = jnp.asarray(x_t["input_ids"])
            if self._stack_arrays is not None:
                outs.append(np.asarray(self._embed_text_fused(ids)))
            else:
                outs.append(
                    np.asarray(self._encode_text(self.params, ids))
                )
        return np.concatenate(outs)

    def _embed_text_fused(self, ids: jnp.ndarray) -> jnp.ndarray:
        from biom3_tpu.ops.pallas.bert_stack_tpu import (
            bert_embed,
            fused_bert_cls,
        )

        dtype = self.model.dtype
        p = self.params["params"]
        x0 = bert_embed(p["text_encoder"], ids, dtype=dtype)
        t_cls = fused_bert_cls(
            x0, **self._stack_arrays["bert"],
            heads=self.config.bert.num_heads, gelu=self.gelu,
            rows=1 if ids.shape[0] % 2 else 2,
            ff_quant=self.bert_ff_quant,
            proj_quant=self.bert_proj_quant,
            softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
            interpret=self._kernel_interpret,
        )
        return self._proj_head(p["text_projection"], t_cls.astype(dtype))

    def embed_tokens(self, x_t: np.ndarray, x_p: np.ndarray) -> tuple:
        if self._stack_arrays is not None and "esm" in self._stack_arrays:
            from biom3_tpu.ops.pallas.bert_stack_tpu import (
                bert_embed,
                fused_bert_cls,
            )
            from biom3_tpu.ops.pallas.esm2_stack_tpu import fused_esm2_cls

            dtype = self.model.dtype
            p = self.params["params"]
            x0 = bert_embed(p["text_encoder"], jnp.asarray(x_t), dtype=dtype)
            t_cls = fused_bert_cls(
                x0, **self._stack_arrays["bert"],
                heads=self.config.bert.num_heads, gelu=self.gelu,
                rows=1 if x_t.shape[0] % 2 else 2,
                ff_quant=self.bert_ff_quant,
                proj_quant=self.bert_proj_quant,
                softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
                interpret=self._kernel_interpret,
            )
            z_t = self._proj_head(p["text_projection"], t_cls.astype(dtype))
            cls = fused_esm2_cls(
                jnp.asarray(x_p), **self._stack_arrays["esm"],
                heads=self.config.esm.attention_heads, gelu=self.gelu,
                ff_quant=self.ff_quant, proj_quant=self.proj_quant,
                softmax_opt=self._vpu_opts[0], ln_onepass=self._vpu_opts[1],
                interpret=self._kernel_interpret,
            )
            z_p = self._proj_head(p["protein_projection"], cls.astype(dtype))
            return z_t, z_p
        out = self._forward(self.params, jnp.asarray(x_t), jnp.asarray(x_p))
        return out["text_joint_latent"], out["seq_joint_latent"]

    def embed(
        self, captions: list[str], sequences: list[str], batch_size: int = 16
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched z_t, z_p for paired caption/sequence lists."""
        z_t_all, z_p_all = [], []
        for i in range(0, len(captions), batch_size):
            x_t, x_p = self.tokenize(
                captions[i : i + batch_size], sequences[i : i + batch_size]
            )
            z_t, z_p = self.embed_tokens(x_t, x_p)
            z_t_all.append(np.asarray(z_t))
            z_p_all.append(np.asarray(z_p))
        return np.concatenate(z_t_all), np.concatenate(z_p_all)
