from biom3_tpu.data.stage3_data import prepare_protein_data, Stage3Dataset
from biom3_tpu.data.stage2_data import FacilitatorDataset, OOD_PFAM_LABELS
from biom3_tpu.data.stage1_data import TextSeqPairingDataset, mask_tokens
from biom3_tpu.data.loader import BatchLoader

__all__ = [
    "prepare_protein_data",
    "Stage3Dataset",
    "FacilitatorDataset",
    "OOD_PFAM_LABELS",
    "TextSeqPairingDataset",
    "mask_tokens",
    "BatchLoader",
]
