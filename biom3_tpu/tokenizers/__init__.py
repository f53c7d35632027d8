from biom3_tpu.tokenizers.esm_alphabet import ESMAlphabet
from biom3_tpu.tokenizers.stage3_vocab import (
    STAGE3_TRAIN_TOKENS,
    STAGE3_DECODE_TOKENS,
    Stage3Vocab,
)

__all__ = [
    "ESMAlphabet",
    "STAGE3_TRAIN_TOKENS",
    "STAGE3_DECODE_TOKENS",
    "Stage3Vocab",
]
