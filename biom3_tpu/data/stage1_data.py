"""Stage-1 data pipeline: paired text/protein tokenization + MLM masking.

Port of ``TextSeqPairing_Dataset`` (``Stage1_source/preprocess.py:25-108``):
BERT wordpiece pad-to-512, ESM tokens pad-to-1024 with pad id 1 (Q3).  The
reference's masked-dataset class was never shipped (SURVEY.md Q2 —
``MaskTextSeqPairing_Dataset`` is referenced but undefined), so the MLM
corruption here is the standard BERT recipe: select 15% of non-special
positions, then 80% → ``<mask>``, 10% → random token, 10% → unchanged.
Note the interaction with the reference's shipped loss
(``compute_masked_lang_loss``, Stage1_source/model.py:401-465): it scores
only positions that carry the mask token in the corrupted input, so the
random/keep corruptions act as input noise (unsupervised) — set
``keep_prob=random_prob=0`` (scheme "all_mask") to score the full 15%.
"""

from __future__ import annotations

import numpy as np

from biom3_tpu.config import Config
from biom3_tpu.tokenizers.esm_alphabet import ESMAlphabet


def mask_tokens(
    tokens: np.ndarray,
    mask_token_id: int,
    special_ids: tuple,
    *,
    mask_prob: float = 0.15,
    mask_frac: float = 0.8,
    random_frac: float = 0.1,
    random_ids: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """BERT-style corruption of ``mask_prob`` of the non-special positions.

    Of the selected positions: ``mask_frac`` become ``mask_token_id``,
    ``random_frac`` become a uniform draw from ``random_ids``, and the rest
    stay unchanged (the 80/10/10 split).  ``random_ids=None`` disables the
    random-replacement bucket (those positions are masked instead), giving
    the pure all-mask scheme when ``mask_frac=1``.
    """
    rng = rng or np.random.default_rng(0)
    special = np.isin(tokens, np.asarray(special_ids))
    selected = (rng.random(tokens.shape) < mask_prob) & ~special
    u = rng.random(tokens.shape)
    if random_ids is None:
        random_frac = 0.0
    to_mask = selected & (u < mask_frac)
    to_random = selected & (u >= mask_frac) & (u < mask_frac + random_frac)
    out = tokens.copy()
    out[to_mask] = mask_token_id
    if random_ids is not None:
        out[to_random] = rng.choice(np.asarray(random_ids), size=int(to_random.sum()))
    return out


class TextSeqPairingDataset:
    """Batched host tokenization for (caption, sequence) pairs.

    Unlike the reference's per-item ``__getitem__`` (batch=1, Q11), batches
    tokenize in one call and stream padded int32 arrays ready for HBM.
    """

    def __init__(self, args: Config, df, text_tokenizer=None):
        self.sequences = df[args.get("sequence_keyword", "protein_sequence")].tolist()
        self.captions = df["[final]text_caption"].tolist()
        self.accessions = df[args.get("id_keyword", "primary_Accession")].tolist()
        self.text_max_length = args.int("text_max_length", 512)
        self.seq_max_length = 1024
        self.alphabet = ESMAlphabet()
        if text_tokenizer is None:
            from biom3_tpu.tokenizers.text import TextTokenizer

            text_tokenizer = TextTokenizer(
                args.text_model_path, max_length=self.text_max_length
            )
        self.text_tokenizer = text_tokenizer

    def __len__(self) -> int:
        return len(self.sequences)

    def get_batch(self, indices, *, with_masks: bool = False, rng=None) -> dict:
        captions = [self.captions[i] for i in indices]
        seqs = [self.sequences[i] for i in indices]
        text = self.text_tokenizer.batch_encode(captions)
        protein = self.alphabet.batch_encode(seqs, pad_to=self.seq_max_length)
        batch = {
            "text_tokens": text["input_ids"],
            "text_attention_mask": text["attention_mask"],
            "protein_tokens": protein,
        }
        if with_masks:
            tok = self.text_tokenizer.tokenizer
            ab = self.alphabet
            text_specials = tuple(tok.all_special_ids)
            text_random = np.setdiff1d(
                np.arange(tok.vocab_size), np.asarray(text_specials)
            )
            # protein random bucket: the 20 standard amino acids
            aa_random = np.asarray(
                [ab.get_idx(a) for a in "ACDEFGHIKLMNPQRSTVWY"], np.int32
            )
            batch["text_tokens_masked"] = mask_tokens(
                text["input_ids"],
                tok.mask_token_id,
                text_specials,
                random_ids=text_random,
                rng=rng,
            )
            batch["protein_tokens_masked"] = mask_tokens(
                protein,
                ab.mask_idx,
                (ab.cls_idx, ab.padding_idx, ab.eos_idx),
                random_ids=aa_random,
                rng=rng,
            )
        return batch

    @staticmethod
    def load_swissprot_csv(args: Config):
        """CSV load + ≤1022-residue filter (ref preprocess.py:156-164)."""
        import pandas as pd

        df = pd.read_csv(args.data_path)
        return df[df["protein_sequence"].apply(lambda s: len(s) <= 1022)]
