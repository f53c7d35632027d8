from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention
from biom3_tpu.ops.attention import full_attention

__all__ = ["linear_attention", "local_window_attention", "full_attention"]
