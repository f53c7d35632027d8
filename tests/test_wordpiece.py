"""Parity: self-contained wordpiece encoder vs the HF ``BertTokenizer``.

The runtime path (``tokenizers/wordpiece.py``) never imports
``transformers``; here HF is the oracle (the exact class the reference
uses on the PubMedBERT vocab, ``Stage1_source/preprocess.py:45-61``).
Adversarial battery: punctuation runs, accents, CJK, control chars,
specials-in-text, >100-char words, truncation, empty/whitespace input —
plus randomized abstracts over a PubMedBERT-scale synthetic vocab.
"""

from __future__ import annotations

import numpy as np
import pytest

from biom3_tpu.tokenizers.synthetic import (
    write_rich_wordpiece,
    write_synthetic_wordpiece,
)
from biom3_tpu.tokenizers.text import TextTokenizer
from biom3_tpu.tokenizers.wordpiece import WordPieceTokenizer

BATTERY = [
    "Protein kinase binding activity.",
    "The enzyme catalyzes transport of a membrane protein, with activity!",
    "a,b..c!!d(e)f[g]{h};i:j'k\"l",
    "café naïve Müller señor Å ångström",
    "结合 protein 酶活性 transport",
    "a\tb\nc\rd  e   f",
    "the [MASK] binds",
    "x[MASK]y [CLS] [SEP] [PAD] [UNK]",
    "[mask] lowercased specials are not special",
    "ProTeIn ENZYME BiNdInG",
    "pH 7.4 @ 37°C ± 0.5% (n=3)",
    "🧬 dna protein 🔬",
    "" ,
    "    ",
    "a" * 150,
    "supercalifragilistic" * 2,
    "protein-binding,enzyme_activity/transport\\membrane",
    "with " + "activity " * 200,  # > 512 pieces → truncation
    "\x00weird�bytes\x7fhere",
]


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("toy_vocab")
    write_synthetic_wordpiece(d)
    return d


@pytest.fixture(scope="module")
def rich_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rich_vocab")
    write_rich_wordpiece(d, n_pieces=4000)  # scale-shaped, test-sized
    return d


def _hf(dirpath, max_length=64):
    from transformers import BertTokenizer

    return BertTokenizer.from_pretrained(str(dirpath)), max_length


def _assert_match(ours, hf, texts, max_length):
    got = ours.batch_encode(texts)
    want = hf.batch_encode_plus(
        texts, truncation=True, max_length=max_length, padding="max_length",
        return_attention_mask=True, return_token_type_ids=False,
    )
    np.testing.assert_array_equal(
        got["input_ids"], np.asarray(want["input_ids"], np.int32)
    )
    np.testing.assert_array_equal(
        got["attention_mask"], np.asarray(want["attention_mask"], np.int32)
    )


@pytest.mark.parametrize("vocab", ["toy", "rich"])
def test_battery_parity(vocab, toy_dir, rich_dir):
    d = toy_dir if vocab == "toy" else rich_dir
    hf, L = _hf(d)
    ours = WordPieceTokenizer(d, max_length=L)
    _assert_match(ours, hf, BATTERY, L)


def test_special_token_surface_matches_hf(toy_dir):
    hf, _ = _hf(toy_dir)
    ours = WordPieceTokenizer(toy_dir)
    assert ours.vocab_size == hf.vocab_size
    assert ours.mask_token_id == hf.mask_token_id
    assert ours.pad_token_id == hf.pad_token_id
    assert sorted(ours.all_special_ids) == sorted(hf.all_special_ids)


def test_random_abstract_parity(rich_dir, rng):
    """200 random pseudo-abstracts over the scale-shaped vocab."""
    hf, L = _hf(rich_dir, max_length=128)
    ours = WordPieceTokenizer(rich_dir, max_length=128)
    letters = np.array(list("etaoinshrdlucmfwypvbgkjqxz.,;()-%0123456789 "))
    texts = []
    for _ in range(200):
        n = int(rng.integers(5, 400))
        texts.append("".join(rng.choice(letters, size=n)))
    _assert_match(ours, hf, texts, 128)


def test_native_matches_python(rich_dir, rng):
    """C++ ASCII fast path vs the pure-Python algorithm, same vocab."""
    from biom3_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    tok = WordPieceTokenizer(rich_dir, max_length=96)
    pure = WordPieceTokenizer(rich_dir, max_length=96)
    pure._native = None  # force the Python path
    letters = np.array(
        list("etaoinshrdlucmfwypvbgkjqxz.,;:()[]{}!?-%$#@&*0123456789 \t")
    )
    texts = ["".join(rng.choice(letters, size=int(rng.integers(0, 300))))
             for _ in range(100)]
    texts += [t for t in BATTERY if t.isascii()]
    a = tok.batch_encode(texts)
    b = pure.batch_encode(texts)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])
    # mixed ascii/unicode batches merge both paths positionally
    mixed = ["protein café", "plain protein", "酶 activity", ""]
    m = tok.batch_encode(mixed)
    p = pure.batch_encode(mixed)
    np.testing.assert_array_equal(m["input_ids"], p["input_ids"])


def test_text_tokenizer_auto_selects_wordpiece(toy_dir):
    tt = TextTokenizer(str(toy_dir), max_length=32)
    assert tt.impl == "wordpiece"
    hf_tt = TextTokenizer(str(toy_dir), max_length=32, impl="hf")
    assert hf_tt.impl == "hf"
    texts = ["protein binding activity", "the [MASK] of enzyme"]
    np.testing.assert_array_equal(
        tt.batch_encode(texts)["input_ids"],
        hf_tt.batch_encode(texts)["input_ids"],
    )
    # stage1_data's mask-corruption path needs these on .tokenizer
    assert tt.tokenizer.mask_token_id == hf_tt.tokenizer.mask_token_id
    assert tt.tokenizer.vocab_size == hf_tt.tokenizer.vocab_size
    assert sorted(tt.tokenizer.all_special_ids) == sorted(
        hf_tt.tokenizer.all_special_ids
    )
