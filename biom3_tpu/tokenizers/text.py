"""Text (wordpiece) tokenizer for the PubMedBERT tower.

The reference tokenizes captions with HF ``AutoTokenizer`` pad-to-max-length
512 (``Stage1_source/preprocess.py:45-61``).  By default this wraps the
self-contained :class:`~biom3_tpu.tokenizers.wordpiece.WordPieceTokenizer`
(reads the local ``vocab.txt`` directly — no ``transformers`` runtime, so
the host tokenize cost in e2e/serving numbers is ours, not a framework's);
``impl="hf"`` falls back to ``AutoTokenizer`` for cross-checking.  Both
emit identical padded numpy batches (parity: ``tests/test_wordpiece.py``).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np


def _read_do_lower_case(model_path: str) -> bool:
    cfg = pathlib.Path(model_path) / "tokenizer_config.json"
    if cfg.is_file():
        try:
            return bool(json.loads(cfg.read_text()).get("do_lower_case", True))
        except (ValueError, OSError):
            pass
    return True  # PubMedBERT-uncased default


class TextTokenizer:
    def __init__(self, model_path: str, max_length: int = 512,
                 impl: str = "auto"):
        vocab = pathlib.Path(model_path) / "vocab.txt"
        if impl == "auto":
            impl = "wordpiece" if vocab.is_file() else "hf"
        self.impl = impl
        if impl == "wordpiece":
            from biom3_tpu.tokenizers.wordpiece import WordPieceTokenizer

            self.tokenizer = WordPieceTokenizer(
                model_path,
                do_lower_case=_read_do_lower_case(model_path),
                max_length=max_length,
            )
        elif impl == "hf":
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        else:
            raise ValueError(f"unknown tokenizer impl {impl!r}")
        self.max_length = max_length

    @property
    def mask_token_id(self) -> int:
        return self.tokenizer.mask_token_id

    def batch_encode(self, captions: list[str]) -> dict:
        """→ {"input_ids": (B, max_length) int32, "attention_mask": ...}."""
        if self.impl == "wordpiece":
            return self.tokenizer.batch_encode(captions)
        enc = self.tokenizer.batch_encode_plus(
            captions,
            truncation=True,
            max_length=self.max_length,
            padding="max_length",
            return_attention_mask=True,
            return_token_type_ids=False,
        )
        return {
            "input_ids": np.asarray(enc["input_ids"], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        }
