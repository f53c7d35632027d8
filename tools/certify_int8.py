"""Certify the int8 serving modes on a TRAINED model (not random init).

The int8 drift gates (bench, interpret twins) run on random-init weights;
trained transformers can develop activation outliers that quantize worse
(the LLM.int8 failure mode — our per-token dynamic × per-out-channel
scheme is the standard mitigation, but it should be MEASURED).  This
harness reuses the blocked-decoding certification task
(``tools/certify_blocked.py``): train the small ProteoScribe on the
class-conditioned copy task, then compare the bf16 stack kernel against
its int8-FF and int8-FF+proj modes on the trained weights:

  * temp-0 sequences: exact-match fraction vs the bf16 kernel (greedy
    decoding is the most quantization-sensitive surface);
  * logit agreement: max |Δ| and min cosine on a probe batch;
  * task quality: coherence / class accuracy per mode (same metrics as
    the blocked certification).

Usage (chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/certify_int8.py \
      --steps 600 --batch 64

Results go to PARITY.md ("int8 serving quantization").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from certify_task import (  # noqa: E402
    MODES,
    build_and_train,
    coherence_stats,
    make_batch,
)

from biom3_tpu.diffusion.sampler import (  # noqa: E402
    make_sampler,
    sample_permutations,
)
from biom3_tpu.models.fused_forward import make_stack_apply  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sample-batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--state-path", default=None,
                    help="pickle shared with certify_blocked/inpaint: load "
                         "the trained params if present, save otherwise")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (pair with small --steps/--batch/"
                         "--seq-len; interpret kernels, f32)")
    ap.add_argument("--modes", nargs="+",
                    default=["bf16", "int8-ff", "int8-ff+proj"],
                    choices=["bf16", "int8-ff", "int8-ff+proj"],
                    help="subset of quant modes to certify (first mode is "
                         "the comparison reference; smoke tests pass two)")
    ap.add_argument("--no-sample", action="store_true",
                    help="skip the temp-0 sampler comparison (logit probe "
                         "only; keeps the CPU-interpret smoke under a "
                         "minute — the sampler scan dominates there)")
    args = ap.parse_args()

    # shared toy-task trainer (certify_task): one training run per chip
    # session across all three certification tools
    cfg, model, state = build_and_train(
        args.steps, args.batch, args.seq_len, state_path=args.state_path
    )

    B = args.sample_batch
    _, z_c, cls = make_batch(np.random.default_rng(7), B, cfg.max_seq_len,
                             cfg.cond_dim)
    path = sample_permutations(jax.random.key(42), B, cfg.max_seq_len)

    # probe logits: trained weights, 16 random positions per row
    prng = np.random.default_rng(11)
    x_probe = jnp.asarray(
        MODES[prng.integers(0, 2, B), prng.integers(0, 4, B)][:, None]
        * np.ones((B, cfg.max_seq_len), np.int32)
    )
    t_probe = jnp.asarray(prng.integers(0, cfg.num_timesteps, B)
                          .astype(np.int32))
    pos_probe = jnp.asarray(
        np.stack([prng.permutation(cfg.max_seq_len)[:16] for _ in range(B)])
        .astype(np.int32)
    )

    all_modes = {"bf16": ("none", "none"), "int8-ff": ("int8", "none"),
                 "int8-ff+proj": ("int8", "int8")}
    modes = [(m, *all_modes[m]) for m in args.modes]
    ref_logits = ref_seqs = None
    for name, ffq, pq in modes:
        apply_fn = make_stack_apply(
            cfg, gelu="erf", resident=True, ff_quant=ffq, proj_quant=pq,
            interpret=args.interpret,
            # CPU smoke: the CPU backend cannot execute bf16 dots
            dtype=jnp.float32 if args.interpret else jnp.bfloat16,
        )
        logits = np.asarray(jax.jit(apply_fn)(
            state.params, x_probe, t_probe, z_c, pos_probe
        ), np.float32)
        row = {"mode": name}
        seqs = None
        if not args.no_sample:
            sampler = make_sampler(
                apply_fn, cfg.num_timesteps, temperature=0.0,
                chunk_steps=None, apply_takes_positions=True,
            )
            seqs = np.asarray(
                sampler(state.params, z_c, path, jax.random.key(5))
            )
            cons, class_ok, diversity = coherence_stats(seqs, cls)
            row.update({
                "coherence_mean": round(float(cons.mean()), 4),
                "class_acc": round(float(class_ok.mean()), 3),
                "mode_diversity": round(diversity, 3),
            })
        if ref_logits is None:
            ref_logits, ref_seqs = logits, seqs
        else:
            cos = (logits * ref_logits).sum(-1) / (
                np.linalg.norm(logits, axis=-1)
                * np.linalg.norm(ref_logits, axis=-1) + 1e-9
            )
            row.update({
                "logit_max_abs_delta": round(
                    float(np.abs(logits - ref_logits).max()), 4),
                "logit_min_cosine": round(float(cos.min()), 6),
            })
            if seqs is not None:
                row.update({
                    "temp0_seq_exact_match": round(
                        float((seqs == ref_seqs).all(axis=1).mean()), 3),
                    "temp0_tok_agreement": round(
                        float((seqs == ref_seqs).mean()), 5),
                })
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
