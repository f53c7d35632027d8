"""ctypes bindings for the C++ host library (biom3_tpu/csrc/biom3_native.cpp).

Builds the shared object on demand with g++ (cached next to the package, or
under ``~/.cache/biom3_tpu`` when site-packages is read-only) and falls back
to the pure-Python tokenizers when no compiler is available — every native
entry point has an identical-behavior Python twin, and the test suite
asserts their equivalence.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "csrc", "biom3_native.cpp")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _lib_candidates():
    yield os.path.join(_PKG_DIR, "_biom3_native.so")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "biom3_tpu",
    )
    yield os.path.join(cache, "_biom3_native.so")


def _build() -> str | None:
    for lib_path in _lib_candidates():
        if (os.path.exists(lib_path)
                and os.path.getmtime(lib_path) >= os.path.getmtime(_SRC)):
            return lib_path
    for lib_path in _lib_candidates():
        try:
            os.makedirs(os.path.dirname(lib_path), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", lib_path],
                check=True, capture_output=True, timeout=120,
            )
            return lib_path
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            continue
    return None


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.esm_batch_encode.restype = ctypes.c_int32
        lib.esm_batch_encode.argtypes = [
            ctypes.c_char_p, i64p, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        lib.stage3_batch_encode.restype = ctypes.c_int32
        lib.stage3_batch_encode.argtypes = lib.esm_batch_encode.argtypes
        lib.stage3_compact_decode.restype = None
        lib.stage3_compact_decode.argtypes = [i32p, ctypes.c_int32, ctypes.c_char_p]
        lib.wordpiece_create.restype = ctypes.c_void_p
        lib.wordpiece_create.argtypes = [
            ctypes.c_char_p, i64p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.wordpiece_destroy.restype = None
        lib.wordpiece_destroy.argtypes = [ctypes.c_void_p]
        lib.wordpiece_batch_encode.restype = ctypes.c_int32
        lib.wordpiece_batch_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, i64p, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p,
        ]
        lib.biom3_native_abi_version.restype = ctypes.c_int32
        assert lib.biom3_native_abi_version() == 2
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _pack(sequences: list[str]) -> tuple[bytes, np.ndarray]:
    data = "".join(sequences).encode("ascii")
    lens = np.fromiter((len(s) for s in sequences), np.int64, len(sequences))
    offsets = np.zeros(len(sequences) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    return data, offsets


def esm_batch_encode(sequences: list[str], pad_to: int) -> np.ndarray:
    """Native twin of ``ESMAlphabet.batch_encode(sequences, pad_to=...)``."""
    lib = get_lib()
    if lib is None:
        from biom3_tpu.tokenizers.esm_alphabet import ESMAlphabet

        return ESMAlphabet().batch_encode(sequences, pad_to=pad_to)
    data, offsets = _pack(sequences)
    out = np.empty((len(sequences), pad_to), np.int32)
    rc = lib.esm_batch_encode(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sequences), pad_to,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"sequence {-rc - 1} longer than pad_to={pad_to} - 2")
    return out


def stage3_batch_encode(sequences: list[str], pad_to: int) -> np.ndarray:
    """Native twin of ``Stage3Vocab.batch_encode`` (also strips gaps)."""
    lib = get_lib()
    if lib is None:
        from biom3_tpu.tokenizers.stage3_vocab import Stage3Vocab

        return Stage3Vocab().batch_encode(
            [s.replace("-", "") for s in sequences], pad_to
        )
    data, offsets = _pack(sequences)
    out = np.empty((len(sequences), pad_to), np.int32)
    rc = lib.stage3_batch_encode(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sequences), pad_to,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise ValueError(f"sequence {-rc - 1} does not fit in {pad_to}")
    if rc > 0:
        raise ValueError(f"sequence {rc - 1} contains out-of-vocab characters")
    return out


class NativeWordPiece:
    """C++ twin of ``WordPieceTokenizer``'s ASCII path.

    Built from the Python tokenizer's vocab dict (token → id, ids dense
    from 0).  ``batch_encode_into`` fills caller buffers for the given
    row indices; rows must be pure-ASCII (the caller routes non-ASCII
    rows to the Python twin).  Returns None from ``create`` when the
    native library (or a special token) is unavailable.
    """

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib

    @classmethod
    def create(cls, vocab: dict[str, int], do_lower_case: bool):
        lib = get_lib()
        if lib is None:
            return None
        toks = sorted(vocab, key=vocab.get)
        if [vocab[t] for t in toks] != list(range(len(toks))):
            return None  # ids must be dense 0..n-1 (vocab.txt order)
        data = "".join(toks).encode("utf-8")
        lens = np.fromiter(
            (len(t.encode("utf-8")) for t in toks), np.int64, len(toks)
        )
        offsets = np.zeros(len(toks) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        handle = lib.wordpiece_create(
            data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(toks), int(do_lower_case),
        )
        return cls(handle, lib) if handle else None

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.wordpiece_destroy(self._handle)
            self._handle = None

    def batch_encode(self, texts: list[str], max_length: int) -> dict:
        data, offsets = _pack(texts)
        ids = np.empty((len(texts), max_length), np.int32)
        mask = np.empty((len(texts), max_length), np.int32)
        rc = self._lib.wordpiece_batch_encode(
            self._handle, data,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(texts), max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        assert rc == 0, rc
        return {"input_ids": ids, "attention_mask": mask}


def stage3_compact_decode(ids: np.ndarray) -> str:
    """One-char-per-position decode ('['=<START> ']'=<END> '.'=<PAD> '*'=mask)."""
    lib = get_lib()
    ids = np.ascontiguousarray(ids, np.int32)
    if lib is None:
        table = "*[ACDEFGHIKLMNPQRSTVWY].XUZBO"
        return "".join(table[i] if 0 <= i < 29 else "?" for i in ids)
    buf = ctypes.create_string_buffer(len(ids))
    lib.stage3_compact_decode(
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ids), buf
    )
    return buf.raw.decode("ascii")
