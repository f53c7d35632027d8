"""Text (wordpiece) tokenizer wrapper for the PubMedBERT tower.

The reference tokenizes captions with HF ``AutoTokenizer`` pad-to-max-length
512 (``Stage1_source/preprocess.py:45-61``).  We wrap the HF tokenizer (host
side only) and emit padded numpy batches ready for HBM transfer.
"""

from __future__ import annotations

import numpy as np


class TextTokenizer:
    def __init__(self, model_path: str, max_length: int = 512):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.max_length = max_length

    @property
    def mask_token_id(self) -> int:
        return self.tokenizer.mask_token_id

    def batch_encode(self, captions: list[str]) -> dict:
        """→ {"input_ids": (B, max_length) int32, "attention_mask": ...}."""
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
