"""Generic mesh-sharded training-step builder (works for any stage task).

Params are placed by the fsdp/tp partition rules; optimizer state is
initialized inside jit so GSPMD propagates each moment onto its param's
sharding (ZeRO-equivalent layout); batch arrays shard their leading dim over
(dp, fsdp).  Used by the stage-specific wrappers.
"""

from __future__ import annotations

from typing import Callable

import jax

from biom3_tpu.parallel.sharding import batch_sharding, put_global, shard_params
from biom3_tpu.training.state import TrainState


def make_sharded_train_step(
    step_fn: Callable,
    tx,
    mesh,
    params,
    *,
    with_ema: bool = False,
    has_rng: bool = True,
):
    """step_fn(state, batch[, key]) → (state, aux), jitted over ``mesh``.

    Returns (jitted_step, sharded_initial_state).
    """
    sharded = shard_params(params, mesh)
    state = jax.jit(lambda p: TrainState.create(p, tx, with_ema=with_ema))(sharded)

    def shard_batch(batch: dict) -> dict:
        return {
            key: put_global(value, batch_sharding(mesh, value.ndim))
            for key, value in batch.items()
        }

    in_shardings = (None, None, None) if has_rng else (None, None)
    jitted = jax.jit(step_fn, in_shardings=in_shardings, donate_argnums=(0,))

    def run(state, batch, *rest):
        return jitted(state, shard_batch(batch), *rest)

    return run, state
