"""Stage-2 (Facilitator) training task.

Replaces ``PL_Facilitator`` (``Stage1_source/PL_wrapper.py:1506-1613``):
forward z_t → z_c, loss = MSE or MMD per ``loss_type``, AdamW.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from biom3_tpu.models.facilitator import mmd_loss, mse_loss
from biom3_tpu.training.state import TrainState


def stage2_loss_fn(apply_fn: Callable, params, z_t, z_p, *, loss_type: str = "MMD"):
    z_c = apply_fn(params, z_t)
    if loss_type == "MSE":
        loss = mse_loss(z_c, z_p)
    elif loss_type == "MMD":
        loss = mmd_loss(z_c, z_p)
    else:
        raise ValueError(f"invalid loss option {loss_type!r}")
    return loss, {"loss": loss, "mse": mse_loss(z_c, z_p)}


def make_stage2_train_step(
    apply_fn: Callable, tx: optax.GradientTransformation, *, loss_type: str = "MMD"
):
    def train_step(state: TrainState, batch: dict):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: stage2_loss_fn(
                apply_fn, p, batch["z_t"], batch["z_p"], loss_type=loss_type
            ),
            has_aux=True,
        )(state.params)
        return state.apply_gradients(grads, tx), aux

    return train_step
