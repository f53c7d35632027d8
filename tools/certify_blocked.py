"""Certify blocked any-order decoding (VERDICT r1 task 4).

Blocked decoding (``positions_per_step=k>1``) samples the next k path
positions *independently from the same conditional* — exact only when those
positions are conditionally independent given the revealed context.  No
published weights exist in this sandbox, so this harness builds a task where
inter-position dependence is REAL and measurable, trains a small
ProteoScribe on it, and quantifies how generation quality degrades with k:

  Data: every sequence is ONE token repeated across all L positions, drawn
  uniformly from the 4-token mode set of its class (class conditioned via
  z_c).  The mode is recoverable only from other positions' content —
  exactly the dependence blocked decoding ignores.  A perfect any-order
  sampler commits to one mode with its first position and copies it
  everywhere; independent in-block samples can mix modes.  (An earlier
  phase-shifted-motif variant required mod-PERIOD positional arithmetic the
  small model never learned — loss pinned at ln 5; pure copying isolates
  the in-block independence error from model capacity.)

  Metrics per (temperature, k): coherence = fraction of positions equal to
  the row's majority token (1.0 = fully coherent); frac_coherent_99 = rows
  with coherence > 0.99; class_acc = rows whose majority token is in the
  class's mode set (conditioning fidelity).

Usage (chip or CPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/certify_blocked.py \
      --steps 600 --batch 64 --ks 1 2 4 8 --temps 1.0 0.5 0.0

Results recorded in PARITY.md ("Blocked decoding certification").
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations

from certify_task import (  # shared toy-task machinery
    build_and_train,
    coherence_stats,
    make_batch,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sample-batch", type=int, default=64)
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--temps", type=float, nargs="*", default=[1.0, 0.5, 0.0])
    ap.add_argument("--orders", nargs="*", default=["path"],
                    choices=["path", "confidence"],
                    help="decode orderings to A/B: 'confidence' is the "
                         "MaskGIT-style easy-first extension — expected to "
                         "recover blocked (k>1) quality at temp>0 because "
                         "the k most-certain positions are the ones whose "
                         "conditionals have already collapsed to one mode")
    ap.add_argument("--maskgit-steps", type=int, nargs="*", default=[],
                    help="also certify the parallel iterative re-masking "
                         "sampler at these step counts (L tokens in S "
                         "forwards; rows labeled order='maskgit-S')")
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--state-path", default=None,
                    help="pickle of trained params: load if present, save "
                         "after training otherwise (share one training run "
                         "across the certification tools)")
    args = ap.parse_args()

    cfg, model, state = build_and_train(
        args.steps, args.batch, args.seq_len, state_path=args.state_path
    )

    B = args.sample_batch
    _, z_c, cls = make_batch(np.random.default_rng(7), B, cfg.max_seq_len,
                             cfg.cond_dim)
    path = sample_permutations(jax.random.key(42), B, cfg.max_seq_len)

    results = []
    for order in args.orders:
        for temp in args.temps:
            for k in args.ks:
                sampler = make_sampler(
                    model.apply, cfg.num_timesteps, temperature=temp,
                    positions_per_step=k, chunk_steps=None, order=order,
                )
                t0 = time.time()
                seqs = np.asarray(
                    sampler(state.params, z_c, path, jax.random.key(5))
                )
                wall = time.time() - t0
                cons, class_ok, mode_entropy = coherence_stats(seqs, cls)
                row = {
                    "order": order, "temp": temp, "k": k,
                    "coherence_mean": round(float(cons.mean()), 4),
                    "coherence_p10": round(float(np.percentile(cons, 10)), 4),
                    "frac_coherent_99": round(float((cons > 0.99).mean()), 3),
                    "class_acc": round(float(class_ok.mean()), 3),
                    "mode_entropy": round(mode_entropy, 3),
                    "wall_s": round(wall, 1),
                }
                results.append(row)
                print(json.dumps(row), flush=True)

    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    for S in args.maskgit_steps:
        for temp in args.temps:
            sampler = make_maskgit_sampler(
                model.apply, cfg.max_seq_len, steps=S, temperature=temp,
            )
            t0 = time.time()
            seqs = np.asarray(
                sampler(state.params, z_c, None, jax.random.key(5))
            )
            wall = time.time() - t0
            cons, class_ok, mode_entropy = coherence_stats(seqs, cls)
            row = {
                "order": f"maskgit-{S}", "temp": temp, "k": None,
                "coherence_mean": round(float(cons.mean()), 4),
                "coherence_p10": round(float(np.percentile(cons, 10)), 4),
                "frac_coherent_99": round(float((cons > 0.99).mean()), 3),
                "class_acc": round(float(class_ok.mean()), 3),
                "mode_entropy": round(mode_entropy, 3),
                "wall_s": round(wall, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    print("\nSummary (coherence mean over", B, "samples):")
    temps = sorted({r["temp"] for r in results}, reverse=True)
    # maskgit rows carry k=None and live outside the per-order tables
    ks = sorted({r["k"] for r in results if r["k"] is not None})
    for order in args.orders:
        print(f"\norder={order}")
        header = "| temp | " + " | ".join(f"k={k}" for k in ks) + " |"
        print(header)
        print("|" + "---|" * (len(ks) + 1))
        for t in temps:
            vals = [r for k in ks for r in results
                    if r["order"] == order and r["temp"] == t and r["k"] == k]
            print(f"| {t} | " + " | ".join(
                f"{v['coherence_mean']:.3f}" for v in vals) + " |")


if __name__ == "__main__":
    main()
