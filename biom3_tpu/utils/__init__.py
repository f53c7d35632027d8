from biom3_tpu.utils.profiling import device_memory_stats, profile_trace
from biom3_tpu.utils.logging import MetricLogger

__all__ = ["device_memory_stats", "profile_trace", "MetricLogger"]
