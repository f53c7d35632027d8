from biom3_tpu.pipeline.stage2 import FacilitatorEngine
from biom3_tpu.pipeline.stage3 import ProteoScribeEngine

__all__ = ["FacilitatorEngine", "ProteoScribeEngine"]
