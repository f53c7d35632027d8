"""Certify the inpainting surface: does filling respect committed context?

The copy task (``certify_task.py``) makes restoration exactly scorable:
every sequence is one token repeated, so ANY single revealed position
determines every masked one.  A context-respecting inpainter restores the
original token at 100% (temp 0); an inpainter that ignores the committed
residues reverts to unconditional generation (~25% per-class mode chance).

Methods certified (all take the same corrupted inputs):
  * ``inpaint-confidence`` — the /v1/inpaint serving path
    (``diffusion/inpainting.py:make_inpainter(order="confidence")``),
  * ``inpaint-path`` — the reference-faithful resume-from-t trajectory
    (``Stage3_source/sampling_analysis.py:122-201``),
  * ``autocomplete`` — the reference's one-shot fill (:21-61),
  * ``maskgit-S`` — the parallel sampler resuming from the partial
    sequence (``make_maskgit_sampler(x0=...)``).

Metrics per (method, revealed fraction, temperature):
  restore_acc  — fraction of ORIGINALLY-MASKED positions whose fill equals
                 the source token (chance ≈ 1/29 unconditional, 0.25 with
                 class conditioning only);
  row_perfect  — fraction of rows fully restored;
  committed_ok — invariant: revealed positions never change (must be 1.0).

Usage (chip or CPU):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/certify_inpaint.py \
      --steps 600 --batch 64 --fracs 0.5 0.25 0.05 --temps 0.0 1.0

Results recorded in PARITY.md ("Inpainting certification").
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.diffusion.inpainting import (
    autocomplete,
    corrupt_samples,
    make_inpainter,
)
from biom3_tpu.diffusion.sampler import make_maskgit_sampler

from certify_task import build_and_train, make_batch


def restore_stats(out, real, masked):
    out, real, masked = map(np.asarray, (out, real, masked))
    was_masked = masked == 0
    hit = (out == real) & was_masked
    restore_acc = hit.sum() / was_masked.sum()
    row_perfect = float(
        ((hit.sum(1) == was_masked.sum(1)) | (was_masked.sum(1) == 0)).mean()
    )
    committed_ok = float((out[~was_masked] == masked[~was_masked]).all())
    return float(restore_acc), row_perfect, committed_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--sample-batch", type=int, default=64)
    ap.add_argument("--fracs", type=float, nargs="*",
                    default=[0.5, 0.25, 0.05])
    ap.add_argument("--temps", type=float, nargs="*", default=[0.0, 1.0])
    ap.add_argument("--maskgit-steps", type=int, nargs="*", default=[16])
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--state-path", default=None,
                    help="pickle of trained params: load if present, save "
                         "after training otherwise (share one training run "
                         "across the certification tools)")
    args = ap.parse_args()

    cfg, model, state = build_and_train(
        args.steps, args.batch, args.seq_len, state_path=args.state_path
    )
    L = cfg.max_seq_len
    B = args.sample_batch
    real, z_c, cls = make_batch(np.random.default_rng(7), B, L, cfg.cond_dim)

    results = []

    def record(method, frac, temp, out, masked, wall):
        acc, perfect, committed = restore_stats(out, real, masked)
        row = {
            "method": method, "revealed_frac": frac, "temp": temp,
            "restore_acc": round(acc, 4), "row_perfect": round(perfect, 3),
            "committed_ok": committed, "wall_s": round(wall, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # build each (temp, order/method) executable ONCE — revealed fraction
    # only changes inputs, so every frac reuses the same compiled fn
    methods = {}
    for temp in args.temps:
        for order in ("confidence", "path"):
            methods[(f"inpaint-{order}", temp)] = make_inpainter(
                model.apply, L, temperature=temp, order=order,
            )
        for S in args.maskgit_steps:
            methods[(f"maskgit-{S}", temp)] = make_maskgit_sampler(
                model.apply, L, steps=S, temperature=temp,
            )

    for frac in args.fracs:
        masked, path, t = corrupt_samples(jax.random.key(3), real, frac, L)
        for temp in args.temps:
            for (name, mtemp), fn in methods.items():
                if mtemp != temp:
                    continue
                t0 = time.time()
                if name.startswith("maskgit"):
                    out = fn(state.params, z_c, None, jax.random.key(5),
                             x0=masked)
                else:
                    out = fn(state.params, masked, z_c, path, t,
                             jax.random.key(5))
                record(name, frac, temp, np.asarray(out), masked,
                       time.time() - t0)

            t0 = time.time()
            out, _ = autocomplete(
                model.apply, state.params, masked, z_c, t,
                key=None if temp == 0.0 else jax.random.key(5),
            )
            record("autocomplete", frac, temp, np.asarray(out), masked,
                   time.time() - t0)

    print("\nSummary (restore_acc):")
    methods = sorted({r["method"] for r in results})
    print("| frac | temp | " + " | ".join(methods) + " |")
    print("|" + "---|" * (len(methods) + 2))
    for frac in args.fracs:
        for temp in args.temps:
            vals = []
            for m in methods:
                v = [r for r in results if r["method"] == m
                     and r["revealed_frac"] == frac and r["temp"] == temp]
                vals.append(f"{v[0]['restore_acc']:.3f}" if v else "—")
            print(f"| {frac} | {temp} | " + " | ".join(vals) + " |")
    bad = [r for r in results if r["committed_ok"] != 1.0]
    print(f"\ncommitted-positions invariant: "
          f"{'VIOLATED: ' + json.dumps(bad) if bad else 'held in all cells'}")


if __name__ == "__main__":
    main()
