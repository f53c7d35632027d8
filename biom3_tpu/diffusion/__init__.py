from biom3_tpu.diffusion.oa_ardm import (
    sample_random_paths,
    mask_realizations,
    oa_ardm_loss,
)
from biom3_tpu.diffusion.sampler import make_sampler

__all__ = [
    "sample_random_paths",
    "mask_realizations",
    "oa_ardm_loss",
    "make_sampler",
]
