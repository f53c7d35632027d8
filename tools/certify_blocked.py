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
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.stage3_task import make_stage3_train_step
from biom3_tpu.training.state import TrainState

MODES = np.array([
    [3, 7, 11, 15],   # class 0 mode set
    [4, 8, 12, 16],   # class 1 mode set
])


def make_batch(rng, B, L, cond_dim):
    cls = rng.integers(0, 2, B)
    tok = MODES[cls, rng.integers(0, MODES.shape[1], B)]
    tokens = np.repeat(tok[:, None], L, axis=1).astype(np.int32)
    z_c = np.where(cls[:, None] == 0, 1.0, -1.0) * np.ones((B, cond_dim))
    return jnp.asarray(tokens), jnp.asarray(z_c.astype(np.float32)), cls


def coherence_stats(seqs: np.ndarray, cls: np.ndarray):
    """Per-row (majority-token fraction, majority-token-in-class-set), plus
    mode diversity: normalized entropy of the majority-token distribution
    within each class (1.0 = samples spread uniformly over the class's
    4-token mode set, 0.0 = every sample picked the same mode).  Guards the
    confidence-ordering A/B against trading diversity for coherence —
    easy-first commits to a mode via its most-certain position, which could
    collapse the mode distribution even while coherence improves."""
    B, L = seqs.shape
    coh = np.zeros(B)
    class_ok = np.zeros(B, bool)
    tops = np.zeros(B, seqs.dtype)
    for b in range(B):
        toks, counts = np.unique(seqs[b], return_counts=True)
        top = toks[np.argmax(counts)]
        coh[b] = counts.max() / L
        class_ok[b] = top in MODES[cls[b]]
        tops[b] = top
    ents = []
    for c in np.unique(cls):
        _, counts = np.unique(tops[cls == c], return_counts=True)
        p = counts / counts.sum()
        ents.append(-(p * np.log(p)).sum() / np.log(MODES.shape[1]))
    return coh, class_ok, float(np.mean(ents))


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
    args = ap.parse_args()

    cfg = ProteoScribeConfig(
        num_classes=29, dim=128, depth=4, n_blocks=1, heads=8, local_heads=4,
        local_window=64, max_seq_len=args.seq_len, num_timesteps=args.seq_len,
        cond_dim=32,
    )
    model = ProteoScribe(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
    )
    tx = make_optimizer("AdamW", 1e-3, weight_decay=1e-6)
    state = TrainState.create(params, tx)
    step = jax.jit(make_stage3_train_step(model.apply, tx))

    # scanned trainer: data pre-generated on host, steps chunked per
    # dispatch (the tunnel adds ~0.2 s/dispatch; a python-loop trainer
    # would spend 13 min dispatching 4 s of compute)
    rng = np.random.default_rng(0)
    chunk = 100
    n_chunks = max(1, args.steps // chunk)
    t0 = time.time()

    @jax.jit
    def train_chunk(state, tokens_c, zc_c, key):
        def body(carry, xs):
            st, _ = carry
            tok, zc, k = xs
            st, aux = step(st, {"tokens": tok, "z_c": zc}, k)
            return (st, aux["loss"]), ()
        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)),
            (tokens_c, zc_c, jax.random.split(key, tokens_c.shape[0])),
        )
        return state, loss

    for c in range(n_chunks):
        toks = np.empty((chunk, args.batch, cfg.max_seq_len), np.int32)
        zcs = np.empty((chunk, args.batch, cfg.cond_dim), np.float32)
        for i in range(chunk):
            t_, z_, _ = make_batch(rng, args.batch, cfg.max_seq_len,
                                   cfg.cond_dim)
            toks[i], zcs[i] = np.asarray(t_), np.asarray(z_)
        state, loss = train_chunk(state, jnp.asarray(toks), jnp.asarray(zcs),
                                  jax.random.key(1000 + c))
        print(f"chunk {c + 1}/{n_chunks} (step {(c + 1) * chunk}): "
              f"loss {float(loss):.4f}", flush=True)
    print(f"trained {n_chunks * chunk} steps in {time.time()-t0:.0f}s")

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
    ks = sorted({r["k"] for r in results})
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
