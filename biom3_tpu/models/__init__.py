from biom3_tpu.models.bert import BertEncoder
from biom3_tpu.models.esm2 import ESM2
from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.models.fused_forward import make_fused_apply
from biom3_tpu.models.pencl import PenCL, ProjectionHead
from biom3_tpu.models.proteoscribe import ProteoScribe

__all__ = [
    "BertEncoder",
    "ESM2",
    "Facilitator",
    "PenCL",
    "ProjectionHead",
    "ProteoScribe",
    "make_fused_apply",
]
