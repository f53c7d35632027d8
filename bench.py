"""Benchmark harness: the three driver metrics on one chip (BASELINE.md:26).

Prints ONE JSON line with the headline metric (ProteoScribe seqs/sec/chip)
plus a ``metrics`` map carrying all three:

  * ``proteoscribe_seqs_per_sec_per_chip`` — the reference's
    throughput-critical path (SURVEY.md §3.3) at reference semantics: full
    1024-step conditional denoising of a batch of 32 sequences, one position
    per step, compiled as an on-device ``lax.scan``.
  * ``pencl_pairs_per_sec`` — Stage-1 embedding throughput: full-size
    ESM2-650M (L=1024) + PubMedBERT (L=512) + projection heads, bf16.
  * ``e2e_p50_latency_s`` — one prompt through all three stages
    (text encode → facilitator → 5-replica 1024-step denoise), p50 of
    steady-state runs (random weights; timing-only).

Each metric reports achieved TFLOP/s and MFU (matmul-FLOP convention,
``biom3_tpu.utils.flops``).  ``vs_baseline`` compares the headline against
an *estimated* A100 eager-PyTorch rate — derivation pinned in BASELINE.md
("A100 baseline estimate").
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EAGER_SEQS_PER_SEC_EST = 0.12  # derivation: BASELINE.md "A100 baseline estimate"


def _host_init(init_fn, *shaped_args):
    """Random params via eval_shape + host RNG — avoids compiling a giant
    on-device init graph for the 650M-param towers (bench times forwards,
    not inits)."""
    shapes = jax.eval_shape(init_fn, jax.random.key(0), *shaped_args)
    rng = np.random.default_rng(0)
    leaves, treedef = jax.tree.flatten(shapes)
    arrs = [
        jnp.asarray(
            (rng.standard_normal(l.shape) * 0.02).astype(l.dtype)
        )
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, arrs)


def _best_of(fn, *args, runs=2):
    """Steady-state best wall time; first call (compile+warm) reported too.

    Timing via host fetch (np.asarray) — block_until_ready can return early
    through the TPU tunnel (CLAUDE.md).
    """
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    warm_s = time.perf_counter() - t0
    best = float("inf")
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
        best = min(best, times[-1])
    return best, warm_s - best, times


def bench_proteoscribe(peak):
    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
    from biom3_tpu.models.fused_forward import make_stack_apply
    from biom3_tpu.models.proteoscribe import ProteoScribe
    from biom3_tpu.utils.flops import (
        proteoscribe_forward_flops,
        proteoscribe_int8_flops_fraction,
    )

    cfg = ProteoScribeConfig()  # full reference config
    B = 32  # reference batch_size_sample (stage3_config.json:16)
    on_tpu = jax.devices()[0].platform != "cpu"
    model = ProteoScribe(cfg, dtype=jnp.bfloat16)

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.cond_dim)),
    )
    z_c = jnp.zeros((B, cfg.cond_dim), jnp.float32)
    path = sample_permutations(jax.random.key(1), B, cfg.max_seq_len)

    # serving path (= ProteoScribeEngine default on TPU): the whole-stack
    # resident Pallas kernel — ONE kernel per model call, all 16 layers'
    # weights VMEM-resident, head applied at the decode positions only
    # (ops/pallas/stack_kernel_tpu) — with the int8 MXU mode on the
    # d-major weight stream (on-chip A/B tools/exp_kernels.py --which
    # int8, 2026-08-19: 18.42 vs 23.09 ms/call bf16, 1.25×); CPU falls
    # back to the Flax/XLA graph
    if on_tpu:
        # + exact-math VPU shaving (exp2-folded local softmax, one-read
        # LayerNorms): 18.05 vs 18.48 ms/call (exp_kernels --which vpu)
        apply_fn = make_stack_apply(cfg, gelu="tanh", resident=True,
                                    ff_quant="int8", proj_quant="int8",
                                    stream="dl", softmax_opt=True,
                                    ln_onepass=True)
        takes_pos = True
        attn_impl = "stack-pallas-resident(tanh-gelu,int8-ff+proj,dl,vpu-opt)"
    else:
        apply_fn, takes_pos, attn_impl = model.apply, False, "xla"

    # on-chip numerics check: stack kernel vs the Flax/XLA graph at 8
    # gathered positions (includes the documented tanh-GELU deviation and
    # the int8 quantization noise)
    x_chk = jnp.zeros((2, cfg.max_seq_len), jnp.int32)
    t_chk = jnp.zeros((2,), jnp.int32)
    pos_chk = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None] * 100, (2, 1))
    ref_logits = jnp.take_along_axis(
        jax.jit(model.apply)(params, x_chk, t_chk, z_c[:2]),
        pos_chk[..., None], axis=1,
    )
    if on_tpu:
        got_logits = apply_fn(params, x_chk, t_chk, z_c[:2], pos_chk)
    else:
        got_logits = ref_logits
    attn_delta = float(jnp.max(jnp.abs(ref_logits - got_logits)))
    ref_np = np.asarray(ref_logits, np.float32)
    got_np = np.asarray(got_logits, np.float32)
    gate_cos = float(
        ((ref_np * got_np).sum(-1) / (
            np.linalg.norm(ref_np, axis=-1)
            * np.linalg.norm(got_np, axis=-1) + 1e-30
        )).min()
    )
    # loud numerics gate: per-position logit cosine vs the Flax graph —
    # the same >0.999 envelope the interpret twins and the int8 drift
    # tests enforce (bf16 + tanh-GELU + int8 quant noise all land well
    # inside it; real divergence does not)
    if gate_cos < 0.999:
        raise AssertionError(
            f"stack kernel vs Flax logits diverged: min cosine "
            f"{gate_cos:.6f} (max abs delta {attn_delta:.3f})"
        )

    # parity mode: 1 position/step — chunked dispatch bounds single-execution
    # wall clock (the tunnel runtime kills ~1-minute executions)
    parity = make_sampler(
        apply_fn, cfg.num_timesteps, chunk_steps=128,
        apply_takes_positions=takes_pos,
    )
    best_parity, compile_s, _ = _best_of(
        lambda k: parity(params, z_c, path, k), jax.random.key(2)
    )

    # fast mode: blocked decoding, 8 positions per forward
    fast = make_sampler(
        apply_fn, cfg.num_timesteps, chunk_steps=128, positions_per_step=8,
        apply_takes_positions=takes_pos,
    )
    best_fast, _, _ = _best_of(
        lambda k: fast(params, z_c, path, k), jax.random.key(3)
    )

    flops_total = proteoscribe_forward_flops(cfg, B) * cfg.num_timesteps
    tflops = flops_total / best_parity / 1e12
    # mixed-precision MFU basis: the FF + q/k/v/out matmuls run int8 (2×
    # the bf16 issue rate on v5e) — same blended ceiling as bench_pencl
    int8_frac = (proteoscribe_int8_flops_fraction(cfg, ff=True, proj=True)
                 if on_tpu else 0.0)
    peak_basis = peak / (1.0 - int8_frac / 2.0) if peak else None
    return {
        "value": round(B / best_parity, 3),
        "unit": "seqs/sec (1024-step denoise, B=32, bf16 + int8 FF/proj, "
                "1 pos/step)",
        "tflops": round(tflops, 1),
        "mfu": round(tflops * 1e12 / peak_basis, 3) if peak_basis else None,
        "peak_basis": peak_basis,
        "detail": {
            "batch": B,
            "steps": cfg.num_timesteps,
            "best_run_s": round(best_parity, 3),
            "compile_s": round(compile_s, 1),
            "attn_impl": attn_impl,
            "stack_vs_flax_max_abs_logit_delta": attn_delta,
            "stack_vs_flax_min_logit_cosine": round(gate_cos, 6),
            "int8_covered_flop_fraction": round(int8_frac, 3),
            "fast_mode_seqs_per_sec": round(B / best_fast, 3),
            "fast_mode": "blocked any-order decoding, 8 pos/forward",
        },
    }


def bench_pencl(peak):
    from biom3_tpu.config import PenCLConfig
    from biom3_tpu.models.pencl import PenCL
    from biom3_tpu.utils.flops import (
        pencl_int8_flops_fraction,
        pencl_pair_forward_flops,
    )

    cfg = PenCLConfig()  # full ESM2-650M + PubMedBERT
    # measured TPU serving defaults: whole-tower streamed-weights fused ESM2
    # kernel with int8 FF (tools/exp_esm2_stack.py: 126.9 int8 vs 100.9 bf16
    # vs 74.4 XLA seq/s tower-only, CLS cosine 0.999939) + fused BERT tower
    # + tanh-GELU
    on_tpu = jax.devices()[0].platform != "cpu"
    tower_impl = ("esm2-stack-int8[ff+proj]+bert-int8ff+pallas"
                  if on_tpu else "xla")
    model = PenCL(cfg, dtype=jnp.bfloat16,
                  attn_impl="pallas:1024:1024" if on_tpu else "xla",
                  gelu="tanh" if on_tpu else "erf")
    # B=32 edges B=16 with the int8 towers (on-chip A/B 2026-08-19:
    # 127.1 vs 125.4 pairs/s full combo; bf16 was a tie 95.2 vs 94.5)
    B, iters = 32, 8
    x_t = jnp.zeros((B, cfg.text_max_length), jnp.int32)
    x_p = jnp.ones((B, cfg.seq_max_length), jnp.int32)
    params = _host_init(model.init, x_t[:1], x_p[:1])

    if on_tpu:
        from biom3_tpu.models.pencl import ProjectionHead
        from biom3_tpu.ops.pallas.bert_stack_tpu import (
            bert_embed,
            bert_stack_arrays,
            fused_bert_cls,
        )
        from biom3_tpu.ops.pallas.esm2_stack_tpu import (
            esm2_stack_arrays,
            fused_esm2_cls,
        )

        arrays = {
            # full int8 combo (ESM2 FF + q/k/v/out, BERT FF + q/k/v/out):
            # pair-level on-chip A/Bs tools/exp_pencl_quant.py (2026-08-19):
            # 94.5 bf16 → 125.4 (esm ff+proj + bert ff, B=16) → 127.9
            # (+ bert proj, B=32), min cosine 0.999980 — covered by the
            # drift gate below
            "esm": esm2_stack_arrays(
                params["params"]["protein_encoder"], cfg.esm.num_layers,
                jnp.bfloat16, ff_quant="int8", proj_quant="int8",
            ),
            "bert": bert_stack_arrays(
                params["params"]["text_encoder"], cfg.bert.num_layers,
                jnp.bfloat16, ff_quant="int8", proj_quant="int8",
            ),
        }
        proj = ProjectionHead(cfg.proj_dim, cfg.dropout, jnp.bfloat16)

        def pair_forward(params, arrays, x_t, x_p):
            x0 = bert_embed(params["params"]["text_encoder"], x_t)
            t_cls = fused_bert_cls(
                x0, **arrays["bert"], heads=cfg.bert.num_heads, gelu="tanh",
                ff_quant="int8", proj_quant="int8",
            )
            z_t = proj.apply(
                {"params": params["params"]["text_projection"]},
                t_cls.astype(jnp.bfloat16),
            )
            cls = fused_esm2_cls(
                x_p, **arrays["esm"], heads=cfg.esm.attention_heads,
                gelu="tanh", ff_quant="int8", proj_quant="int8",
            )
            z_p = proj.apply(
                {"params": params["params"]["protein_projection"]},
                cls.astype(jnp.bfloat16),
            )
            return z_t, z_p
    else:
        arrays = None

        def pair_forward(params, arrays, x_t, x_p):
            out = model.apply(params, x_t, x_p)
            return out["text_joint_latent"], out["seq_joint_latent"]

    @jax.jit
    def many(params, arrays, x_t, x_p):
        def body(carry, _):
            # BOTH tower inputs must depend on the carry, and the carry on
            # the outputs: a severable chain (the old ``carry * 0``) lets
            # XLA's while-loop LICM hoist the towers out of the scan, and
            # an invariant x_p alone lets it hoist the whole ESM tower —
            # either way "iters forwards" silently times ~one forward
            # (this inflated pairs/s ~2x vs the chip's measured GEMM peak).
            z_t, z_p = pair_forward(params, arrays, x_t + carry, x_p + carry)
            s = z_t.sum() + z_p.sum()
            return jnp.abs(s).astype(jnp.int32) % 2, s
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums

    best, compile_s, _ = _best_of(lambda: many(params, arrays, x_t, x_p))
    pairs_per_sec = B * iters / best
    flops = pencl_pair_forward_flops(cfg) * B * iters
    tflops = flops / best / 1e12
    # mixed-precision MFU basis: the ESM2 FF matmuls run int8 (2× the bf16
    # issue rate), so the bf16-equivalent ceiling for THIS path is
    # peak/(1 − f/2) with f the int8-covered FLOP fraction — without this,
    # an int8 win would read as >100% MFU (or, via main()'s basis
    # inflation, silently deflate the other metrics' MFU)
    int8_frac = (
        pencl_int8_flops_fraction(cfg, esm_ff=True, esm_proj=True,
                                  bert_ff=True)
        if on_tpu else 0.0
    )
    peak_basis = peak / (1.0 - int8_frac / 2.0) if peak else None

    # serving-vs-parity drift gate: protein embedding cosine between the
    # perf graph (flash + tanh-GELU) and the erf/XLA reference graph, same
    # bf16 params, one batch (mirrors the stack kernel's drift record)
    drift_cos = None
    if on_tpu:
        ref_model = PenCL(cfg, dtype=jnp.bfloat16)
        zt_fast, zp_fast = jax.jit(
            lambda p, a, t, x: pair_forward(p, a, t, x)
        )(params, arrays, x_t[:4], x_p[:4])
        ref_out = jax.jit(lambda p, t, x: ref_model.apply(p, t, x))(
            params, x_t[:4], x_p[:4]
        )
        cos_min = 1.0
        for zf, zr in (
            (zt_fast, ref_out["text_joint_latent"]),
            (zp_fast, ref_out["seq_joint_latent"]),
        ):
            zf = np.asarray(zf, np.float32)
            zr = np.asarray(zr, np.float32)
            cos = (zf * zr).sum(-1) / (
                np.linalg.norm(zf, axis=-1) * np.linalg.norm(zr, axis=-1)
            )
            cos_min = min(cos_min, float(cos.min()))
        drift_cos = round(cos_min, 6)
        assert drift_cos > 0.999, f"serving-graph drift: cosine {drift_cos}"

    return {
        "value": round(pairs_per_sec, 2),
        "unit": "embedding pairs/sec (ESM2-650M L=1024 + BERT L=512, "
                "bf16 + int8 FF/proj)",
        "tflops": round(tflops, 1),
        "mfu": round(tflops * 1e12 / peak_basis, 3) if peak_basis else None,
        # own mixed-precision ceiling — main() must NOT fold this metric's
        # achieved rate into the shared bf16 basis
        "peak_basis": peak_basis,
        "detail": {"batch": B, "iters": iters,
                   "compile_s": round(compile_s, 1),
                   "attn_impl": tower_impl,
                   "gelu": "tanh" if on_tpu else "erf",
                   "int8_covered_flop_fraction": round(int8_frac, 3),
                   "fast_vs_ref_min_cosine": drift_cos},
        # drift gate compares the SERVED path (fused stack kernel + tanh)
        # against the erf/XLA bf16 reference graph on the same params
    }


def bench_e2e(peak):
    """Text → protein p50 latency: encode prompt, facilitate, denoise 5
    replicas (the reference's num_replicas, stage3_config.json:15)."""
    from biom3_tpu.config import (
        FacilitatorConfig,
        PenCLConfig,
        ProteoScribeConfig,
    )
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
    from biom3_tpu.models.facilitator import Facilitator
    from biom3_tpu.models.pencl import PenCL
    from biom3_tpu.models.proteoscribe import ProteoScribe
    from biom3_tpu.utils.flops import (
        pencl_pair_forward_flops,
        proteoscribe_forward_flops,
    )

    from biom3_tpu.models.fused_forward import make_stack_apply

    R = 5  # replicas per prompt
    p_cfg = PenCLConfig()
    f_cfg = FacilitatorConfig()
    s_cfg = ProteoScribeConfig()
    on_tpu = jax.devices()[0].platform != "cpu"
    attn_impl = "stack-pallas-resident(tanh-gelu)" if on_tpu else "xla"

    pencl = PenCL(p_cfg, dtype=jnp.bfloat16)
    x_t0 = jnp.zeros((1, p_cfg.text_max_length), jnp.int32)
    p_params = _host_init(pencl.init, x_t0, jnp.ones((1, 8), jnp.int32))
    encode = jax.jit(
        lambda p, x: pencl.apply(p, x, method=PenCL.encode_text)
    )

    # Host wordpiece tokenization IN the timed loop (SURVEY.md §7 hard part
    # 5; VERDICT r2 #4): self-contained encoder over a PubMedBERT-scale
    # synthetic vocab (the published vocab.txt is not downloadable here;
    # greedy-match cost depends on vocab shape, not its words).
    import tempfile

    from biom3_tpu.tokenizers.synthetic import write_rich_wordpiece
    from biom3_tpu.tokenizers.wordpiece import WordPieceTokenizer

    vocab_dir = tempfile.mkdtemp(prefix="bench_vocab_")
    n_vocab = write_rich_wordpiece(
        vocab_dir, n_pieces=min(30522, p_cfg.bert.vocab_size)
    )
    tok = WordPieceTokenizer(vocab_dir, max_length=p_cfg.text_max_length)
    prompt = (
        "PROTEIN NAME: Tumor necrosis factor. FUNCTION: Cytokine that binds "
        "to TNFRSF1A/TNFR1 and TNFRSF1B/TNFBR, and is mainly secreted by "
        "macrophages; it can induce cell death of certain tumor cell lines, "
        "is a potent pyrogen causing fever by direct action or by "
        "stimulation of interleukin-1 secretion, and is implicated in the "
        "induction of cachexia. SUBCELLULAR LOCATION: cell membrane; "
        "single-pass type II membrane protein."
    )

    def encode_prompt(text):
        ids = tok.batch_encode([text])["input_ids"] % p_cfg.bert.vocab_size
        return jnp.asarray(ids)

    fac = Facilitator(f_cfg)
    f_params = fac.init(jax.random.key(1), jnp.zeros((1, f_cfg.in_dim)))
    facilitate = jax.jit(fac.apply)

    ps = ProteoScribe(s_cfg, dtype=jnp.bfloat16)
    s_params = ps.init(
        jax.random.key(2),
        jnp.zeros((1, s_cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, s_cfg.cond_dim)),
    )
    if on_tpu:
        # same serving default as bench_proteoscribe: int8 FF+proj, dl
        s_apply = make_stack_apply(s_cfg, gelu="tanh", resident=True,
                                   ff_quant="int8", proj_quant="int8",
                                   stream="dl", softmax_opt=True,
                                   ln_onepass=True)
        s_takes_pos = True
    else:
        s_apply, s_takes_pos = ps.apply, False
    sampler = make_sampler(
        s_apply, s_cfg.num_timesteps, chunk_steps=128,
        apply_takes_positions=s_takes_pos,
    )
    # fast mode: blocked any-order decoding, 8 positions/forward — the
    # certified approximation (PARITY.md "blocked decoding certification")
    sampler_fast = make_sampler(
        s_apply, s_cfg.num_timesteps, chunk_steps=128, positions_per_step=8,
        apply_takes_positions=s_takes_pos,
    )
    path = sample_permutations(jax.random.key(3), R, s_cfg.max_seq_len)

    def pipeline(key, fast=False):
        x_t = encode_prompt(prompt)  # host tokenize → device transfer
        z_t = encode(p_params, x_t)
        z_c = facilitate(f_params, z_t.astype(jnp.float32))
        z_c = jnp.tile(z_c, (R, 1))
        return (sampler_fast if fast else sampler)(s_params, z_c, path, key)

    _, compile_s, _ = _best_of(lambda: pipeline(jax.random.key(4)), runs=1)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(pipeline(jax.random.key(5 + i)))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    _, _, _ = _best_of(lambda: pipeline(jax.random.key(9), fast=True), runs=1)
    fast_times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(pipeline(jax.random.key(10 + i), fast=True))
        fast_times.append(time.perf_counter() - t0)
    p50_fast = float(np.median(fast_times))
    # host-tokenization throughput: the 1k-prompt sweep's input-side rate
    # (pipeline/sweep.py feeds z_c downstream of exactly this encode).  If
    # prompts/s here >> TPU pairs/s, the sweep is provably not input-bound.
    prompts_1k = [f"{prompt} variant {i} with activity {i % 7}."
                  for i in range(1000)]
    t0 = time.perf_counter()
    tok.batch_encode(prompts_1k)
    tokenize_1k_s = time.perf_counter() - t0

    flops = (
        pencl_pair_forward_flops(p_cfg) * 0.4  # text tower + head only (~40%)
        + proteoscribe_forward_flops(s_cfg, R) * s_cfg.num_timesteps
    )
    tflops = flops / p50 / 1e12
    return {
        "value": round(p50, 2),
        "unit": "s p50 latency, 1 prompt -> 5 replicas (1024-step denoise)",
        "tflops": round(tflops, 1),
        "mfu": round(tflops * 1e12 / peak, 3) if peak else None,
        "detail": {
            "replicas": R,
            "runs_s": [round(t, 2) for t in times],
            "compile_s": round(compile_s, 1),
            "attn_impl": attn_impl,
            "fast_mode_p50_s": round(p50_fast, 2),
            "fast_mode": "blocked any-order decoding, 8 pos/forward",
            "host_tokenize_in_loop": True,
            "wordpiece_vocab_size": n_vocab,
            "tokenize_prompts_per_s": round(1000 / tokenize_1k_s, 1),
        },
    }


def bench_served(peak):
    """Exact-mode SERVED throughput through the continuous scheduler
    (VERDICT r4 #4: serving gains must be driver-visible in BENCH).

    64 in-process closed-loop clients submit 1-replica generate requests
    to a real ``ContinuousGenerateBatcher`` over the full-size engine;
    embeds are stubbed to a fixed z_c (bench_pencl measures the towers —
    this metric isolates scheduler + sampler, the Stage-3 serving path).
    Throughput is counted over the second half of the wall budget, after
    the ~18 s trajectory ramp, so it is the steady-state retirement rate.
    Compare detail.fraction_of_offline with the headline sampler rate:
    r4 measured 99.3%% through the full HTTP daemon
    (outputs/chip_session_logs/r4_serving_chunk64_r32x4.log).
    """
    import os
    import threading

    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        return {
            "value": None,
            "unit": "seqs/sec served (continuous scheduler, in-process)",
            "detail": {"skipped": "full-size serving is a chip metric"},
        }

    R = 32  # rows per dispatch (the certified exact-serving geometry)
    eng = ProteoScribeEngine(
        Config({}), None, dtype=jnp.bfloat16, temperature=1.0,
        chunk_steps=64,  # r4 admission-granularity winner (occupancy 1.00)
    )

    class _ShimPipeline:
        """Stage-3-only pipeline surface for the scheduler (stub embed)."""

        s3 = eng
        _mesh = None
        _interpret = False
        rows_per_dispatch = R
        default_replicas = 1
        seed = 0

        def __init__(self):
            self._device_lock = threading.Lock()
            self._dispatches = 0
            self._rows_live = 0
            self._z = np.zeros((1, eng.config.cond_dim), np.float32)

        def _record_dispatch(self, live):
            self._dispatches += 1
            self._rows_live += live

        def embed(self, prompts):
            z = np.repeat(self._z, len(prompts), 0)
            return z, z

    pipe = _ShimPipeline()
    batcher = ContinuousGenerateBatcher(pipe)
    t0 = time.perf_counter()
    batcher.warmup()
    compile_s = time.perf_counter() - t0

    budget_s = float(os.environ.get("BIOM3_SERVED_BUDGET_S", "75"))
    completions: list[float] = []
    stop = threading.Event()
    lock = threading.Lock()

    def client(i):
        # stagger starts across the first trajectory: simultaneous
        # arrivals admit as ONE cohort that retires in synchronized
        # waves, which aliases against the steady-window edges (first
        # run of this metric read 1.42 for a 1.77 steady rate)
        if stop.wait(i * 0.25):
            return
        j = 0
        while not stop.is_set():
            try:
                fut = batcher.submit({
                    "prompt": f"bench client {i} req {j}",
                    "num_replicas": 1,
                })
                fut.result(timeout=600)
            except Exception:  # noqa: BLE001 — shutdown path
                return
            j += 1
            with lock:
                completions.append(time.perf_counter())

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(64)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(budget_s)
    stop.set()
    t_end = time.perf_counter()
    batcher.close(timeout=60, drain_s=0.0)
    for t in threads:
        t.join(timeout=30)

    # steady window: one full trajectory AFTER retirements begin — the
    # ramp admits faster than slots retire (queued clients fill freed
    # slots in bursts), so windows that include any part of the first
    # rotation read HIGH (a 45 s budget with a half-budget window
    # measured 1.35x the offline rate — impossible in steady state)
    with lock:
        all_c = sorted(completions)
    if not all_c:
        rate, steady = 0.0, []
    else:
        window_start = all_c[0] + 20.0
        steady = [c for c in all_c if c >= window_start]
        span = t_end - window_start
        rate = len(steady) / span if span > 5.0 else len(all_c) / (
            t_end - t_start
        )
    occ = (pipe._rows_live / (R * pipe._dispatches)
           if pipe._dispatches else 0.0)
    return {
        "value": round(rate, 3),
        "unit": "seqs/sec served (continuous scheduler, 64 in-process "
                "clients, exact 1024-step rows)",
        "detail": {
            "rows_per_dispatch": R,
            "chunk_steps": 64,
            "clients": 64,
            "budget_s": budget_s,
            "compile_s": round(compile_s, 1),
            "completed_total": len(completions),
            "completed_steady_window": len(steady),
            "row_occupancy": round(occ, 3),
        },
    }


def measure_gemm_peak() -> float:
    """Sustained bf16 GEMM rate via a dependent matmul chain (512→2048→512,
    the Stage-3 FF shape).  The tunnel device has been observed to sustain
    well above its 'v5 lite' label's 197 TF/s — MFU is reported against
    max(label peak, this measurement, any achieved rate) so it stays ≤ 1
    and meaningful.  The tunnel adds ~0.2 s of constant dispatch latency
    per execution, which once under-reported this probe by 4× — so the
    rate is taken from the TIME DIFFERENCE between a short and a long
    chain (same dispatch path, overhead cancels)."""
    M, K, N = 32768, 512, 2048
    key = jax.random.key(0)
    w1 = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.02
    short, long = 128, 1024

    def chain(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                return (c @ w1) @ w2, ()
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out[0, :8]  # tiny host fetch — large fetches skew timing
        return run

    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    t_short, _, _ = _best_of(chain(short), x, runs=3)
    t_long, _, _ = _best_of(chain(long), x, runs=3)
    if t_long <= t_short:  # tunnel noise swamped the difference
        return long * 2 * 2 * M * K * N / t_long
    return (long - short) * 2 * 2 * M * K * N / (t_long - t_short)


def _with_retries(fn, peak, attempts=2, unit=""):
    """Run one metric, retrying transient tunnel failures (remote compile
    500s, worker kills); after the last attempt return an error stub so one
    flaky metric can't void the whole bench artifact."""
    err = None
    for i in range(attempts):
        try:
            return fn(peak)
        except Exception as e:  # noqa: BLE001 — tunnel errors vary widely
            err = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# {fn.__name__} attempt {i + 1}/{attempts} failed: {err}",
                  file=sys.stderr)
            time.sleep(15)
    return {"value": None, "unit": unit, "tflops": None, "error": err}


def _probe_backend(timeout_s: float = 420.0) -> str | None:
    """Prove the device backend answers — in a SUBPROCESS, because a dead
    TPU tunnel makes jax.devices() hang ~indefinitely in-process (CLAUDE.md)
    and a hung bench is worse than an honest failure stub.  Returns the
    platform string, or None when the backend is unreachable."""
    import os
    import subprocess

    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "x = jnp.ones((128, 128), jnp.bfloat16)\n"
        "np.asarray(x @ x)\n"  # a real dispatch must round-trip
        "print(d[0].platform)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env=dict(os.environ),
        )
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
        print(f"# backend probe failed: {r.stderr[-300:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"# backend probe timed out after {timeout_s}s",
              file=sys.stderr)
    return None


def main() -> None:
    platform = _probe_backend()
    if platform is None:
        # one parseable line, value null — the driver's artifact records a
        # dead tunnel instead of a hung or absent bench
        print(json.dumps({
            "metric": "proteoscribe_seqs_per_sec_per_chip",
            "value": None,
            "unit": "seqs/s/chip",
            "vs_baseline": None,
            "error": "device backend unreachable (TPU tunnel down; "
                     "probe dispatch timed out)",
        }))
        return

    from biom3_tpu.utils.flops import device_peak_flops

    label_peak = device_peak_flops()
    try:
        gemm_tflops = measure_gemm_peak()
    except Exception as e:  # noqa: BLE001
        print(f"# gemm peak probe failed: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)
        gemm_tflops = 0.0
    peak = max(label_peak or 0.0, gemm_tflops) or None
    metrics = {}
    metrics["pencl_pairs_per_sec"] = _with_retries(
        bench_pencl, peak, unit="pairs/s")
    # the headline metric gets more attempts — without it there is nothing
    # to report, so let the final failure propagate loudly
    metrics["proteoscribe_seqs_per_sec_per_chip"] = _with_retries(
        bench_proteoscribe, peak, attempts=3, unit="seqs/s/chip")
    if metrics["proteoscribe_seqs_per_sec_per_chip"]["value"] is None:
        raise RuntimeError(
            "headline metric failed every attempt: "
            f"{metrics['proteoscribe_seqs_per_sec_per_chip']['error']}")
    metrics["e2e_p50_latency_s"] = _with_retries(bench_e2e, peak, unit="s")
    metrics["served_seqs_per_sec"] = _with_retries(
        bench_served, peak, unit="seqs/s served")
    if (metrics["served_seqs_per_sec"].get("value")
            and metrics["proteoscribe_seqs_per_sec_per_chip"].get("value")):
        metrics["served_seqs_per_sec"]["detail"]["fraction_of_offline"] = (
            round(metrics["served_seqs_per_sec"]["value"]
                  / metrics["proteoscribe_seqs_per_sec_per_chip"]["value"],
                  3)
        )

    # MFU basis must dominate every ACHIEVED rate (the GEMM probe reads low
    # when tunnel dispatch latency swamps it; an achieved rate is itself a
    # peak lower bound) — recompute so mfu ≤ 1 by construction.  Metrics
    # with their own mixed-precision basis (int8 paths, "peak_basis") are
    # excluded: their bf16-equivalent rate may legitimately exceed the bf16
    # peak and must not deflate the pure-bf16 metrics' MFU.
    achieved = max(
        (m.get("tflops") or 0.0) * 1e12
        for m in metrics.values() if not m.get("peak_basis")
    )
    if peak is None or achieved > peak:
        peak = max(peak or 0.0, achieved)
        for m in metrics.values():
            if m.get("tflops") and not m.get("peak_basis"):
                m["mfu"] = round(m["tflops"] * 1e12 / peak, 3)

    head = metrics["proteoscribe_seqs_per_sec_per_chip"]
    print(
        json.dumps(
            {
                "metric": "proteoscribe_seqs_per_sec_per_chip",
                "value": head["value"],
                "unit": head["unit"],
                "vs_baseline": round(
                    head["value"] / A100_EAGER_SEQS_PER_SEC_EST, 2
                ),
                "metrics": metrics,
                "device": str(jax.devices()[0]),
                "peak_flops_basis": peak,
                "peak_label_flops": label_peak,
                "measured_gemm_tflops": round(gemm_tflops / 1e12, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
