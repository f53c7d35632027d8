from biom3_tpu.diffusion.oa_ardm import (
    sample_random_paths,
    mask_realizations,
    oa_ardm_loss,
)
from biom3_tpu.diffusion.inpainting import (
    autocomplete,
    corrupt_samples,
    make_inpainter,
)
from biom3_tpu.diffusion.sampler import make_maskgit_sampler, make_sampler

__all__ = [
    "autocomplete",
    "corrupt_samples",
    "make_inpainter",
    "make_maskgit_sampler",
    "make_sampler",
    "mask_realizations",
    "oa_ardm_loss",
    "sample_random_paths",
]
