"""Stage-2 inference engine: z_t → z_c with evaluation metrics.

Mirrors ``run_Facilitator_sample.py`` (main :64-121): load ``.pt`` embedding
dict, run the Facilitator, compute MSE/MMD/norm diagnostics, save with 'z_c'.
The MLP compiles to a single XLA fusion; metrics run on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import Config, FacilitatorConfig
from biom3_tpu.io.convert import facilitator_params_from_torch
from biom3_tpu.io.torch_load import load_torch_file
from biom3_tpu.models.facilitator import Facilitator, mmd_loss, mse_loss


class FacilitatorEngine:
    def __init__(self, stage_config: Config, model_path: str | None = None):
        self.config = FacilitatorConfig.from_stage_config(stage_config)
        self.model = Facilitator(self.config)
        if model_path is not None:
            self.params = facilitator_params_from_torch(
                load_torch_file(model_path), self.config
            )
        else:
            self.params = self.model.init(
                jax.random.key(0), jnp.zeros((1, self.config.in_dim))
            )
        self._forward = jax.jit(self.model.apply)

    def __call__(self, z_t: np.ndarray) -> jax.Array:
        return self._forward(self.params, jnp.asarray(z_t, jnp.float32))

    def run_dataset(self, embedding_dataset: dict) -> tuple[dict, dict]:
        """Returns (dataset with 'z_c' added, metrics dict) — the reference
        CLI's printed diagnostics (run_Facilitator_sample.py:85-118)."""
        z_t = jnp.asarray(np.asarray(embedding_dataset["z_t"]), jnp.float32)
        z_p = jnp.asarray(np.asarray(embedding_dataset["z_p"]), jnp.float32)
        z_c = self._forward(self.params, z_t)
        metrics = {
            "mse_zc_zp": float(mse_loss(z_c, z_p)),
            "mse_zt_zp": float(mse_loss(z_t, z_p)),
            "mmd_zc_zp": float(mmd_loss(z_c, z_p)),
            "mmd_zp_zt": float(mmd_loss(z_p, z_t)),
            "norm_z_t": float(jnp.linalg.norm(z_t[0])),
            "norm_z_p": float(jnp.linalg.norm(z_p[0])),
            "norm_z_c": float(jnp.linalg.norm(z_c[0])),
        }
        out = dict(embedding_dataset)
        out["z_c"] = np.asarray(z_c)
        return out, metrics
