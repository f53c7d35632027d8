"""Tokenizer tests: ESM alphabet layout and Stage-3 vocab quirks (Q10)."""

import numpy as np

from biom3_tpu.tokenizers import ESMAlphabet, Stage3Vocab
from biom3_tpu.tokenizers.stage3_vocab import (
    STAGE3_DECODE_TOKENS,
    STAGE3_TRAIN_TOKENS,
)


def test_esm_alphabet_layout():
    ab = ESMAlphabet()
    # the public ESM2 vocabulary (33 tokens)
    assert len(ab) == 33
    assert ab.cls_idx == 0
    assert ab.padding_idx == 1
    assert ab.eos_idx == 2
    assert ab.unk_idx == 3
    assert ab.mask_idx == 32
    assert ab.all_toks[4] == "L"
    assert ab.all_toks[23] == "C"
    assert ab.all_toks[30] == "-"
    assert ab.all_toks[31] == "<null_1>"


def test_esm_batch_encode_pad_to_1024():
    ab = ESMAlphabet()
    seq = "MAKEDNIEMQGTVLETLPNTMFRVELENGHVVTAHISGKMRKNYIRILTGDKVTVELTPYDLSKGRIVFRSR"
    toks = ab.batch_encode([seq], pad_to=1024)
    assert toks.shape == (1, 1024)
    assert toks[0, 0] == ab.cls_idx
    assert toks[0, len(seq) + 1] == ab.eos_idx
    # reference pads with token id 1 after <eos> (Stage1_source/preprocess.py:70-74)
    assert (toks[0, len(seq) + 2 :] == ab.padding_idx).all()
    assert toks[0, 1] == ab.get_idx("M")
    # unknown characters map to <unk>
    assert ab.batch_encode(["J"], pad_to=None)[0, 1] == ab.unk_idx


def test_stage3_vocab_tables():
    assert len(STAGE3_TRAIN_TOKENS) == 28
    assert len(STAGE3_DECODE_TOKENS) == 29
    # decode table from run_ProteoScribe_sample.py:88-92
    assert STAGE3_DECODE_TOKENS[:2] == ["-", "<START>"]
    assert STAGE3_DECODE_TOKENS[22] == "<END>"
    assert STAGE3_DECODE_TOKENS[23] == "<PAD>"
    # +1 shift makes train ids line up with decode indices
    vocab = Stage3Vocab()
    for i, tok in enumerate(STAGE3_TRAIN_TOKENS):
        shifted = i + 1
        decoded = STAGE3_DECODE_TOKENS[shifted]
        if tok == "-":
            assert decoded == "<PAD>"  # the famous pad/gap rename (Q10)
        else:
            assert decoded == tok


def test_stage3_encode_decode_roundtrip():
    vocab = Stage3Vocab()
    ids = vocab.encode_sequence("ACDEF", pad_to=16)
    assert ids.shape == (16,)
    shifted = vocab.shift_for_model(ids)
    decoded = vocab.decode_ids(shifted)
    assert decoded.startswith("<START>ACDEF<END>")
    assert vocab.clean_sequence(decoded) == "ACDEF"
    # padding decodes to <PAD> under the shifted table
    assert decoded.endswith("<PAD>" * 9)


def test_stage3_batch_encode():
    vocab = Stage3Vocab()
    arr = vocab.batch_encode(["AC", "WYX"], pad_to=8)
    assert arr.shape == (2, 8)
    assert arr.dtype == np.int32
