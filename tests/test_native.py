"""Native C++ tokenizer: equivalence with the pure-Python implementations."""

import numpy as np
import pytest

from biom3_tpu import native
from biom3_tpu.tokenizers.esm_alphabet import ESMAlphabet
from biom3_tpu.tokenizers.stage3_vocab import Stage3Vocab


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


SEQS = [
    "MAKEDNIEMQGTVLETLPNTMFRVELENGHVVTAHISGKMRKNYIRILTGDKVTVELTPYDLSKGRIVFRSR",
    "ACDEFGHIKLMNPQRSTVWY",
    "XUZBO",
    "M",
]


def test_esm_encode_matches_python(lib):
    ref = ESMAlphabet().batch_encode(SEQS, pad_to=128)
    out = native.esm_batch_encode(SEQS, pad_to=128)
    np.testing.assert_array_equal(out, ref)


def test_esm_encode_unknown_char(lib):
    ref = ESMAlphabet().batch_encode(["MJQ"], pad_to=16)  # J → <unk>
    out = native.esm_batch_encode(["MJQ"], pad_to=16)
    np.testing.assert_array_equal(out, ref)
    assert out[0, 2] == 3


def test_esm_encode_overflow(lib):
    with pytest.raises(ValueError, match="longer than"):
        native.esm_batch_encode(["A" * 20], pad_to=16)


def test_stage3_encode_matches_python(lib):
    vocab = Stage3Vocab()
    ref = vocab.batch_encode(SEQS, pad_to=128)
    out = native.stage3_batch_encode(SEQS, pad_to=128)
    np.testing.assert_array_equal(out, ref)


def test_stage3_encode_strips_gaps(lib):
    vocab = Stage3Vocab()
    ref = vocab.batch_encode(["ACDEF"], pad_to=32)
    out = native.stage3_batch_encode(["AC-DE--F"], pad_to=32)
    np.testing.assert_array_equal(out, ref)


def test_stage3_encode_bad_char(lib):
    with pytest.raises(ValueError, match="out-of-vocab"):
        native.stage3_batch_encode(["AC1"], pad_to=16)


def test_compact_decode(lib):
    vocab = Stage3Vocab()
    ids = vocab.shift_for_model(vocab.encode_sequence("ACDEF", pad_to=10))
    s = native.stage3_compact_decode(ids)
    assert s == "[ACDEF]..."


def test_native_throughput_sanity(lib):
    """Native encode of a 1k batch must beat the Python loop comfortably."""
    import time

    seqs = ["ACDEFGHIKLMNPQRSTVWY" * 25] * 1000  # 500-residue sequences
    t0 = time.perf_counter()
    native.esm_batch_encode(seqs, pad_to=1024)
    native_t = time.perf_counter() - t0
    ab = ESMAlphabet()
    t0 = time.perf_counter()
    ab.batch_encode(seqs, pad_to=1024)
    python_t = time.perf_counter() - t0
    assert native_t < python_t, (native_t, python_t)
