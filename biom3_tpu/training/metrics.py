"""Evaluation metrics, vectorized for device execution.

Ports of the reference's metric suite:
  * contrastive classification metrics (sklearn micro-averaged accuracy /
    precision / recall / F1 over argmax logits — ``Stage1_source/
    PL_wrapper.py:1334-1398``; for single-label multiclass, micro P/R/F1 all
    equal accuracy, which is what sklearn returns there),
  * RankMe effective rank + singular-value spectrum for dimensionality-
    collapse tracking (``:1399-1441``; the reference's covariance
    normalization divides by 1 due to a loop-variable bug, SURVEY.md Q9 —
    we normalize by the sample count and expose ``quirk_q9`` to reproduce
    the reference),
  * BLOSUM62 soft accuracy (``Stage3_source/eval_metrics.py:17-132``) with
    the 24×24 matrix embedded as a constant (replacing the biopython C
    extension),
  * entropy-"perplexity" per position (``:135-164``) and hard accuracy
    (``:167-197``), with past/current/future time splits (``:200-412``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --- contrastive classification metrics -------------------------------------


def contrastive_metrics(logits: jax.Array) -> dict:
    """Argmax-accuracy metrics of the (2B, 2B) contrastive logits
    (text rows × protein cols), matching performance_metrics
    (Stage1_source/PL_wrapper.py:1334-1398)."""
    logits = logits.astype(jnp.float32)
    n = logits.shape[0]
    y_true = jnp.arange(n)
    p_text = jax.nn.softmax(logits, axis=-1)
    p_seq = jax.nn.softmax(logits.T, axis=-1)
    p_tot = (p_seq + p_text) / 2

    def acc(p):
        return jnp.mean((jnp.argmax(p, axis=-1) == y_true).astype(jnp.float32))

    out = {}
    for source, p in (("text", p_text), ("seq", p_seq), ("total", p_tot)):
        a = acc(p)
        # single-label multiclass ⇒ micro precision = recall = f1 = accuracy
        out.update({
            f"{source}_accuracy": a, f"{source}_precision": a,
            f"{source}_recall": a, f"{source}_f1": a,
        })
    return out


# --- RankMe / singular spectrum ---------------------------------------------


def singular_spectrum(z: jax.Array, *, quirk_q9: bool = False) -> jax.Array:
    """Singular values of the (centered) covariance of embeddings (B, D).

    quirk_q9=True reproduces the reference's 1/1 normalization
    (PL_wrapper.py:1419); default divides by the sample count.
    """
    z = z.astype(jnp.float32)
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    cov = zc.T @ zc
    if not quirk_q9:
        cov = cov / z.shape[0]
    return jnp.linalg.svd(cov, compute_uv=False)


def rankme(singular_values: jax.Array, eps: float = 1e-12) -> jax.Array:
    """RankMe effective rank: exp(entropy of normalized singular values)."""
    p = singular_values / (jnp.sum(singular_values) + eps)
    return jnp.exp(-jnp.sum(p * jnp.log(p + eps)))


# --- BLOSUM62 ----------------------------------------------------------------

BLOSUM62_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZX*"
# Public BLOSUM62 substitution matrix (Henikoff & Henikoff 1992), the same
# table biopython loads (Stage3_source/eval_metrics.py:21-22).
BLOSUM62 = np.array([
    [ 4,-1,-2,-2, 0,-1,-1, 0,-2,-1,-1,-1,-1,-2,-1, 1, 0,-3,-2, 0,-2,-1, 0,-4],
    [-1, 5, 0,-2,-3, 1, 0,-2, 0,-3,-2, 2,-1,-3,-2,-1,-1,-3,-2,-3,-1, 0,-1,-4],
    [-2, 0, 6, 1,-3, 0, 0, 0, 1,-3,-3, 0,-2,-3,-2, 1, 0,-4,-2,-3, 3, 0,-1,-4],
    [-2,-2, 1, 6,-3, 0, 2,-1,-1,-3,-4,-1,-3,-3,-1, 0,-1,-4,-3,-3, 4, 1,-1,-4],
    [ 0,-3,-3,-3, 9,-3,-4,-3,-3,-1,-1,-3,-1,-2,-3,-1,-1,-2,-2,-1,-3,-3,-2,-4],
    [-1, 1, 0, 0,-3, 5, 2,-2, 0,-3,-2, 1, 0,-3,-1, 0,-1,-2,-1,-2, 0, 3,-1,-4],
    [-1, 0, 0, 2,-4, 2, 5,-2, 0,-3,-3, 1,-2,-3,-1, 0,-1,-3,-2,-2, 1, 4,-1,-4],
    [ 0,-2, 0,-1,-3,-2,-2, 6,-2,-4,-4,-2,-3,-3,-2, 0,-2,-2,-3,-3,-1,-2,-1,-4],
    [-2, 0, 1,-1,-3, 0, 0,-2, 8,-3,-3,-1,-2,-1,-2,-1,-2,-2, 2,-3, 0, 0,-1,-4],
    [-1,-3,-3,-3,-1,-3,-3,-4,-3, 4, 2,-3, 1, 0,-3,-2,-1,-3,-1, 3,-3,-3,-1,-4],
    [-1,-2,-3,-4,-1,-2,-3,-4,-3, 2, 4,-2, 2, 0,-3,-2,-1,-2,-1, 1,-4,-3,-1,-4],
    [-1, 2, 0,-1,-3, 1, 1,-2,-1,-3,-2, 5,-1,-3,-1, 0,-1,-3,-2,-2, 0, 1,-1,-4],
    [-1,-1,-2,-3,-1, 0,-2,-3,-2, 1, 2,-1, 5, 0,-2,-1,-1,-1,-1, 1,-3,-1,-1,-4],
    [-2,-3,-3,-3,-2,-3,-3,-3,-1, 0, 0,-3, 0, 6,-4,-2,-2, 1, 3,-1,-3,-3,-1,-4],
    [-1,-2,-2,-1,-3,-1,-1,-2,-2,-3,-3,-1,-2,-4, 7,-1,-1,-4,-3,-2,-2,-1,-2,-4],
    [ 1,-1, 1, 0,-1, 0, 0, 0,-1,-2,-2, 0,-1,-2,-1, 4, 1,-3,-2,-2, 0, 0, 0,-4],
    [ 0,-1, 0,-1,-1,-1,-1,-2,-2,-1,-1,-1,-1,-2,-1, 1, 5,-2,-2, 0,-1,-1, 0,-4],
    [-3,-3,-4,-4,-2,-2,-3,-2,-2,-3,-2,-3,-1, 1,-4,-3,-2,11, 2,-3,-4,-3,-2,-4],
    [-2,-2,-2,-3,-2,-1,-2,-3, 2,-1,-1,-2,-1, 3,-3,-2,-2, 2, 7,-1,-3,-2,-1,-4],
    [ 0,-3,-3,-3,-1,-2,-2,-3,-3, 3, 1,-2, 1,-1,-2,-2, 0,-3,-1, 4,-3,-2,-1,-4],
    [-2,-1, 3, 4,-3, 0, 1,-1, 0,-3,-4, 0,-3,-3,-2, 0,-1,-4,-3,-3, 4, 1,-1,-4],
    [-1, 0, 0, 1,-3, 3, 4,-2, 0,-3,-3, 1,-1,-3,-1, 0,-1,-3,-2,-2, 1, 4,-1,-4],
    [ 0,-1,-1,-1,-2,-1,-1,-1,-1,-1,-1,-1,-1,-1,-2, 0, 0,-2,-1,-1,-1,-1,-1,-4],
    [-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4, 1],
], dtype=np.float32)

# soft-accuracy lookup: soft[a1, a2] = softmax(BLOSUM62[a1])·onehot(a2) /
# max(softmax(BLOSUM62[a1]))  (ref blosum_acc, eval_metrics.py:24-47)
_probs = np.exp(BLOSUM62) / np.exp(BLOSUM62).sum(axis=1, keepdims=True)
BLOSUM62_SOFT = (_probs / _probs.max(axis=1, keepdims=True)).astype(np.float32)

# decode-table id (Stage3 29-token vocab) → BLOSUM62 alphabet index, -1 = not
# an amino acid handled by BLOSUM (special/rare tokens → hard comparison)
from biom3_tpu.tokenizers.stage3_vocab import STAGE3_DECODE_TOKENS


def _decode_to_blosum_index() -> np.ndarray:
    out = np.full(len(STAGE3_DECODE_TOKENS), -1, np.int32)
    for i, tok in enumerate(STAGE3_DECODE_TOKENS):
        if len(tok) == 1 and tok in BLOSUM62_ALPHABET:
            out[i] = BLOSUM62_ALPHABET.index(tok)
    # '-' and markers stay -1 (hard-compared in the reference)
    return out


DECODE_TO_BLOSUM = _decode_to_blosum_index()


def blosum_soft_accuracy(pred_ids: jax.Array, real_ids: jax.Array) -> jax.Array:
    """Vectorized soft accuracy over decode-table id sequences (B, L).

    Per reference semantics (eval_metrics.py:61-132): amino-acid positions
    (both ids map into BLOSUM) score via the softmax-substitution lookup;
    other positions score exact-match; each sample averages its soft and hard
    parts, then the batch averages.
    """
    b_pred = jnp.asarray(DECODE_TO_BLOSUM)[pred_ids]
    b_real = jnp.asarray(DECODE_TO_BLOSUM)[real_ids]
    is_soft = (b_pred >= 0) & (b_real >= 0)

    soft_scores = jnp.asarray(BLOSUM62_SOFT)[
        jnp.clip(b_pred, 0), jnp.clip(b_real, 0)
    ]
    hard_scores = (pred_ids == real_ids).astype(jnp.float32)

    n_soft = jnp.sum(is_soft, axis=-1)
    n_hard = jnp.sum(~is_soft, axis=-1)
    soft_avg = jnp.sum(soft_scores * is_soft, axis=-1) / jnp.maximum(1, n_soft)
    hard_avg = jnp.sum(hard_scores * ~is_soft, axis=-1) / jnp.maximum(1, n_hard)

    per_sample = jnp.where(
        n_soft == 0, hard_avg,
        jnp.where(n_hard == 0, soft_avg, (soft_avg + hard_avg) / 2),
    )
    return jnp.mean(per_sample)


# --- entropy "perplexity" and hard accuracy ----------------------------------


def entropy_ppl(probs: jax.Array) -> jax.Array:
    """exp(entropy) per position, batch-averaged (ref compute_ppl:135-164).
    probs: (B, L, C)."""
    probs = probs.astype(jnp.float32)
    ent = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-30)), axis=-1)
    return jnp.mean(jnp.exp(ent))


def hard_accuracy(
    pred_ids: jax.Array, real_ids: jax.Array, pad_id: int = 23
) -> jax.Array:
    """Exact-match accuracy ignoring <PAD> targets (ref compute_hard_acc:167-197)."""
    valid = real_ids != pad_id
    match = (pred_ids == real_ids) & valid
    per_sample = jnp.sum(match, axis=-1) / jnp.maximum(1, jnp.sum(valid, axis=-1))
    per_sample = jnp.where(jnp.sum(valid, axis=-1) == 0, 1.0, per_sample)
    return jnp.mean(per_sample)


def time_split_metrics(
    pred_ids: jax.Array,
    real_ids: jax.Array,
    probs: jax.Array,
    path: jax.Array,
    t: jax.Array,
) -> dict:
    """Past/current/future metric split along the sampling path
    (ref compute_acc_given_time_pos / compute_ppl_given_time_pos:259-412),
    computed with masks instead of per-sample Python loops."""
    t = t.reshape(-1, 1)
    regions = {
        "prev": path < t,
        "current": path == t,
        "fut": path > t,
    }
    out = {}
    for name, mask in regions.items():
        maskf = mask.astype(jnp.float32)
        n = jnp.maximum(1, jnp.sum(maskf, axis=-1))
        acc = jnp.sum((pred_ids == real_ids) * maskf, axis=-1) / n
        has = jnp.sum(maskf, axis=-1) > 0
        out[f"{name}_hard_acc"] = jnp.sum(acc * has) / jnp.maximum(1, jnp.sum(has))
        ent = -jnp.sum(
            probs * jnp.log(jnp.clip(probs, 1e-30)), axis=-1
        )  # (B, L)
        ppl = jnp.sum(jnp.exp(ent) * maskf, axis=-1) / n
        out[f"{name}_ppl"] = jnp.sum(ppl * has) / jnp.maximum(1, jnp.sum(has))
    return out


def positional_entropy(probs: jax.Array) -> jax.Array:
    """Mean positional entropy (ref compute_pos_entropy,
    transformer_training_helper.py:365-370)."""
    probs = probs.astype(jnp.float32)
    return jnp.mean(-probs * jnp.log(jnp.clip(probs, 1e-30)))
