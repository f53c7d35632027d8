from biom3_tpu.serving.batcher import BatcherStats, MicroBatcher
from biom3_tpu.serving.continuous import ContinuousGenerateBatcher
from biom3_tpu.serving.server import BioM3Server, ServingPipeline
from biom3_tpu.serving.trajectory import TrajectoryBatcher

__all__ = [
    "BatcherStats",
    "BioM3Server",
    "ContinuousGenerateBatcher",
    "MicroBatcher",
    "ServingPipeline",
    "TrajectoryBatcher",
]
