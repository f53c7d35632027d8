"""BASELINE config #5: the bulk generation sweep (1k prompts × N replicas).

Runs the whole pipeline end-to-end at reference serving shapes — host
tokenize → PenCL text embed → Facilitator → Stage-3 denoise — over many
prompts, then QCs every output and prints one JSON line with phase
timings, prompts/hour and the QC table.  This is the driver config that
had zero measured numbers through round 3 (VERDICT task 3); the QC
surface mirrors the reference's ``Stage3_source/eval_metrics.py:259-412``
(validity/composition/entropy; BLOSUM soft accuracy is reported from the
optional inpaint-recovery probe — for pure generation there is no
reference sequence, so it is "n/a" there by construction).

No published checkpoints exist in this sandbox (WEIGHTS.md), so weights
are random-init and the text tower uses the synthetic wordpiece vocab —
the timing and the QC *machinery* are what this measures; sequence
quality numbers become meaningful only once real weights land.

Chip invocations (see tools/chip_session_r4.sh):
  # full-scale fast mode (maskgit): 1000 prompts x 5 replicas
  python tools/run_sweep.py --prompts 1000 --replicas 5 --mode fast
  # exact-mode sample for extrapolation: 32 x 5 = 160 rows
  python tools/run_sweep.py --prompts 32 --replicas 5 --mode exact

``--tiny`` shrinks every stage for a CPU smoke run (tests).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))

# prompt templates: enough lexical variety that tokenization/embedding is
# not degenerately cached; biology-flavored like the reference's captions
_SUBJECTS = [
    "membrane transport protein", "zinc finger transcription factor",
    "atp-dependent kinase", "beta barrel porin", "heat shock chaperone",
    "calcium binding messenger", "serine protease inhibitor",
    "iron sulfur cluster enzyme", "leucine rich repeat receptor",
    "helix turn helix regulator",
]
_QUALIFIERS = [
    "from a thermophilic archaeon", "with high catalytic efficiency",
    "localized to the inner membrane", "involved in dna repair",
    "that binds small peptides", "with a conserved catalytic triad",
    "expressed under oxidative stress", "forming a homodimer",
    "with broad substrate specificity", "stabilized by disulfide bonds",
]


def make_prompts(n: int) -> list[str]:
    return [
        f"a {_SUBJECTS[i % len(_SUBJECTS)]} "
        f"{_QUALIFIERS[(i // len(_SUBJECTS)) % len(_QUALIFIERS)]} "
        f"variant {i}"
        for i in range(n)
    ]


def qc_table(ids: np.ndarray, vocab, max_pairwise: int = 256) -> dict:
    """Structural QC over raw decode-table ids (B, L).

    validity: marker structure (exactly one <START>, >=1 <END>, no
    absorbing-state leftovers); composition: residue frequencies and
    per-class entropy (the reference's eval_metrics composition probes);
    diversity: unique fraction + mean pairwise identity on a sample.
    """
    B, L = ids.shape
    start_id = vocab.decode_tokens.index("<START>")
    end_id = vocab.decode_tokens.index("<END>")
    n_start = (ids == start_id).sum(axis=1)
    n_end = (ids == end_id).sum(axis=1)
    n_absorb = (ids == vocab.absorbing_id).sum(axis=1)
    marker_ok = (n_start == 1) & (n_end >= 1) & (n_absorb == 0)

    # per-class (29-way) empirical distribution -> entropy (nats)
    counts = np.bincount(ids.reshape(-1), minlength=vocab.num_classes)
    p = counts / counts.sum()
    class_entropy = float(-(p[p > 0] * np.log(p[p > 0])).sum())
    # mean per-position entropy (positional mode collapse shows here)
    pos_entropy = []
    for j in range(0, L, max(1, L // 64)):  # 64-position subsample
        c = np.bincount(ids[:, j], minlength=vocab.num_classes)
        q = c / c.sum()
        pos_entropy.append(float(-(q[q > 0] * np.log(q[q > 0])).sum()))

    seqs = [vocab.clean_sequence(vocab.decode_ids(row)) for row in ids]
    lengths = np.array([len(s) for s in seqs])
    uniq = len(set(seqs)) / max(1, len(seqs))
    # mean pairwise identity on a subsample (quadratic, so bounded)
    sample = seqs[:max_pairwise]
    ident = []
    for i in range(0, len(sample) - 1, 2):
        a, b = sample[i], sample[i + 1]
        m = min(len(a), len(b))
        if m:
            ident.append(sum(x == y for x, y in zip(a, b)) / m)
    aa = "ACDEFGHIKLMNPQRSTVWY"
    aa_ids = [vocab.decode_tokens.index(c) for c in aa]
    aa_frac = float(np.isin(ids, aa_ids).mean())
    return {
        "n": int(B),
        "marker_valid_frac": round(float(marker_ok.mean()), 4),
        "absorbing_leftover_frac": round(float((n_absorb > 0).mean()), 4),
        "aa_token_frac": round(aa_frac, 4),
        "class_entropy_nats": round(class_entropy, 4),
        "mean_positional_entropy_nats": round(
            float(np.mean(pos_entropy)), 4
        ),
        "len_mean": round(float(lengths.mean()), 1),
        "len_p5": int(np.percentile(lengths, 5)),
        "len_p95": int(np.percentile(lengths, 95)),
        "unique_frac": round(uniq, 4),
        "mean_pairwise_identity": round(
            float(np.mean(ident)) if ident else 0.0, 4
        ),
    }


def inpaint_recovery_probe(engine, z_c: np.ndarray, ids: np.ndarray,
                           *, masked_frac: float = 0.25,
                           seed: int = 0) -> dict:
    """Corruption-recovery QC (the one place BLOSUM soft accuracy is
    defined for a sweep): re-mask ``masked_frac`` of each generated
    sequence's residue positions and inpaint them back conditioned on the
    same z_c; score recovered vs original at the masked positions with
    the embedded BLOSUM62 soft accuracy (``training/metrics.py``).
    Reference counterpart: ``Stage3_source/sampling_analysis.py:21-61``
    (corrupt/autocomplete analysis)."""
    import jax

    from biom3_tpu.training.metrics import BLOSUM62_SOFT, DECODE_TO_BLOSUM

    rng = np.random.default_rng(seed)
    masked = ids.copy()
    # decode table: the 20 residues map into BLOSUM (DECODE_TO_BLOSUM >= 0)
    maskable = DECODE_TO_BLOSUM[ids] >= 0
    mask = maskable & (rng.random(ids.shape) < masked_frac)
    masked[mask] = 0
    filled = np.asarray(
        engine.inpaint_batch(masked, z_c, jax.random.key(seed))
    )
    frac = mask.mean()
    if not mask.any():
        return {"masked_frac": 0.0}
    exact = float((filled[mask] == ids[mask]).mean())
    # masked-position-only soft score (reference eval_metrics.py:61-132
    # semantics restricted to the corrupted sites): BLOSUM softmax lookup
    # where the prediction is a residue, hard 0 where it is a marker
    b_pred = DECODE_TO_BLOSUM[filled[mask]]
    b_real = DECODE_TO_BLOSUM[ids[mask]]     # >= 0 by construction
    soft = np.where(
        b_pred >= 0,
        np.asarray(BLOSUM62_SOFT)[np.maximum(b_pred, 0), b_real],
        0.0,
    )
    return {
        "masked_frac": round(float(frac), 4),
        "masked_exact_match": round(exact, 4),
        "masked_blosum_soft_acc": round(float(soft.mean()), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", type=int, default=1000)
    ap.add_argument("--replicas", type=int, default=5)
    ap.add_argument("--mode", choices=["fast", "exact"], default="fast",
                    help="fast = maskgit (or blocked, --fast-kind); exact "
                         "= 1-pos/step ARDM (reference semantics)")
    ap.add_argument("--fast-kind", choices=["maskgit", "blocked"],
                    default="maskgit")
    ap.add_argument("--maskgit-steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32,
                    help="Stage-3 device rows per dispatch")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--qc-inpaint-rows", type=int, default=32,
                    help="rows for the inpaint-recovery BLOSUM probe "
                         "(0 disables)")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the JSON report here")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.stage2 import FacilitatorEngine
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from biom3_tpu.tokenizers.synthetic import write_synthetic_wordpiece

    tmp = tempfile.mkdtemp(prefix="run_sweep_")
    vocab_size = write_synthetic_wordpiece(pathlib.Path(tmp) / "tok")

    from bench_common import stage_configs

    s1_cfg, s2_cfg, s3_cfg = stage_configs(
        args.tiny, batch=args.batch, replicas=args.replicas
    )
    s1_cfg["bert_vocab_size"] = vocab_size
    s1_cfg["text_model_path"] = f"{tmp}/tok"

    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    t_build0 = time.time()
    s1 = PenCLEngine(Config(s1_cfg), None, text_only=True, dtype=dtype)
    s2 = FacilitatorEngine(Config(s2_cfg), None)
    s3_kwargs: dict = {"temperature": args.temperature}
    if args.mode == "fast":
        if args.fast_kind == "maskgit":
            s3_kwargs.update(sampler_mode="maskgit",
                             maskgit_steps=args.maskgit_steps)
        else:
            s3_kwargs.update(positions_per_step=8)
    s3 = ProteoScribeEngine(Config(s3_cfg), None, dtype=dtype, **s3_kwargs)
    build_s = time.time() - t_build0

    prompts = make_prompts(args.prompts)
    total_rows = args.prompts * args.replicas

    # phase 1: tokenize + embed text (PenCL tower); first batch timed
    # separately — through the tunnel the one-time compile dominates and
    # would otherwise masquerade as a (very slow) steady rate
    t0 = time.time()
    s1.embed_text(prompts[: args.batch], batch_size=args.batch)
    embed_compile_s = time.time() - t0
    t0 = time.time()
    z_t = s1.embed_text(prompts, batch_size=args.batch)
    embed_s = time.time() - t0
    # phase 2: facilitator
    t0 = time.time()
    z_c = np.asarray(s2(z_t), np.float32)
    facil_s = time.time() - t0

    # phase 3: Stage-3 over the (prompt x replica) grid, fixed-shape slabs
    grid = np.repeat(z_c, args.replicas, axis=0)
    key = jax.random.key(0)
    L = s3.config.max_seq_len
    out_ids = np.zeros((total_rows, L), np.int32)
    t0 = time.time()
    compile_s = None
    for start in range(0, total_rows, args.batch):
        n = min(args.batch, total_rows - start)
        rows = grid[start:start + n]
        if n < args.batch:  # pad the tail to the compiled shape
            rows = np.concatenate(
                [rows, np.repeat(rows[-1:], args.batch - n, axis=0)]
            )
        key, sub = jax.random.split(key)
        ids = s3.sample_batch(rows, sub)
        if compile_s is None:
            compile_s = time.time() - t0  # first slab owns the compile
        out_ids[start:start + n] = ids[:n]
    gen_total_s = time.time() - t0
    gen_steady_s = gen_total_s - (compile_s or 0.0)
    n_slabs = -(-total_rows // args.batch)
    # steady-state rate excludes the first (compile-owning) slab
    steady_rows = total_rows - min(args.batch, total_rows)
    seqs_per_s = (steady_rows / gen_steady_s if steady_rows and gen_steady_s
                  else total_rows / gen_total_s)

    qc = qc_table(out_ids, s3.vocab)
    probe = None
    if args.qc_inpaint_rows:
        m = min(args.qc_inpaint_rows, total_rows, args.batch)
        t0 = time.time()
        probe = inpaint_recovery_probe(s3, grid[:m], out_ids[:m])
        probe["probe_s"] = round(time.time() - t0, 1)

    wall_s = embed_compile_s + embed_s + facil_s + gen_total_s
    # steady-state excludes the one-time compiles (amortized to zero over
    # a production-sized sweep; at 1k prompts they are still ~half the
    # wall through the tunnel's remote compiler)
    steady_s = embed_s + facil_s + gen_steady_s
    report = {
        "metric": "sweep_prompts_per_hour",
        "value": round(args.prompts / (wall_s / 3600.0), 1),
        "unit": f"prompts/hour ({args.replicas} replicas each, "
                f"mode={args.mode}, end-to-end incl. tokenize)",
        "value_steady": round(args.prompts / (steady_s / 3600.0), 1)
        if steady_s else None,
        "config": {
            "prompts": args.prompts, "replicas": args.replicas,
            "mode": args.mode,
            "fast_kind": args.fast_kind if args.mode == "fast" else None,
            "batch": args.batch, "temperature": args.temperature,
            "tiny": args.tiny, "stack_path": s3.use_stack,
            "device": str(jax.devices()[0].device_kind),
        },
        "phases_s": {
            "build": round(build_s, 1),
            "embed_compile": round(embed_compile_s, 1),
            "tokenize_embed": round(embed_s, 1),
            "facilitator": round(facil_s, 1),
            "stage3_total": round(gen_total_s, 1),
            "stage3_compile": round(compile_s or 0.0, 1),
        },
        "rates": {
            "seqs_per_s_steady": round(seqs_per_s, 3),
            "prompts_per_s_embed": round(args.prompts / embed_s, 1),
            "total_sequences": total_rows,
            "slabs": n_slabs,
        },
        "qc": qc,
        "inpaint_recovery": probe,
    }
    line = json.dumps(report)
    print(line, flush=True)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
