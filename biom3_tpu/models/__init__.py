from biom3_tpu.models.bert import BertEncoder
from biom3_tpu.models.esm2 import ESM2
from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.models.pencl import PenCL, ProjectionHead
from biom3_tpu.models.proteoscribe import ProteoScribe

__all__ = [
    "BertEncoder",
    "ESM2",
    "Facilitator",
    "PenCL",
    "ProjectionHead",
    "ProteoScribe",
]
