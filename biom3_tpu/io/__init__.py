from biom3_tpu.io.torch_load import load_torch_file, save_torch_file
from biom3_tpu.io.convert import (
    facilitator_params_from_torch,
    proteoscribe_params_from_torch,
)

__all__ = [
    "load_torch_file",
    "save_torch_file",
    "facilitator_params_from_torch",
    "proteoscribe_params_from_torch",
]
