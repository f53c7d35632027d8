"""Synthetic PubMedBERT-style wordpiece tokenizer directory.

The published text tower tokenizes with HF ``AutoTokenizer`` over the
PubMedBERT wordpiece vocab (Stage1_source/preprocess.py:45-61), whose
files are not downloadable in this sandbox.  This builder writes a
minimal-but-valid ``BertTokenizer`` directory (same specials, lowercase
letters + ##pieces + a few biology words) so every Stage-1 text surface —
CLI subprocess tests, the serving daemon, on-chip serving benches — runs
end-to-end without downloads.  Dims/config stay whatever the caller sets;
only the embedding-table vocab shrinks.
"""

from __future__ import annotations

import json
import pathlib


def write_synthetic_wordpiece(dirpath) -> int:
    """Write vocab.txt + tokenizer_config.json; returns the vocab size."""
    dirpath = pathlib.Path(dirpath)
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    pieces = ["##" + ch for ch in letters]
    words = ["protein", "enzyme", "binding", "membrane", "kinase", "the",
             "a", "of", "with", "activity", "catalyzes", "transport"]
    vocab = specials + letters + pieces + words
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (dirpath / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "BertTokenizer", "do_lower_case": True,
        "model_max_length": 512,
    }))
    return len(vocab)


def write_rich_wordpiece(dirpath, n_pieces: int = 30522, seed: int = 0) -> int:
    """PubMedBERT-*scale* synthetic vocab (default 30522 = bert-base size).

    For host-tokenization throughput measurement (VERDICT r2 #4) a 69-entry
    toy vocab is too easy: real wordpiece cost is dominated by the greedy
    longest-match scan over many multi-char pieces.  This emits specials +
    every printable ASCII char (+##twins) + deterministic random word/
    ##suffix pieces of length 2-12 drawn with an English-like letter
    distribution, so tokenizing abstracts exercises realistic match depth.
    """
    import numpy as np

    dirpath = pathlib.Path(dirpath)
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = [chr(c) for c in range(33, 127)] + [
        chr(c) for c in range(ord("a"), ord("z") + 1)
    ]
    chars = sorted(set(chars))
    base = specials + chars + ["##" + c for c in chars if c.isalnum()]
    rng = np.random.default_rng(seed)
    letters = np.array(list("etaoinshrdlucmfwypvbgkjqxz"))
    weights = np.linspace(2.0, 0.2, len(letters))
    weights /= weights.sum()
    seen = set(base)
    vocab = list(base)
    while len(vocab) < n_pieces:
        n = int(rng.integers(2, 13))
        w = "".join(rng.choice(letters, size=n, p=weights))
        if rng.random() < 0.35:
            w = "##" + w
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (dirpath / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "BertTokenizer", "do_lower_case": True,
        "model_max_length": 512,
    }))
    return len(vocab)
