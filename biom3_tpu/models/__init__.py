from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.models.proteoscribe import ProteoScribe

__all__ = ["Facilitator", "ProteoScribe"]
