"""Functional EMA of parameters.

Replaces the reference's ZeRO-3-aware ``DSEma.moving_average``
(``Stage3_source/DSEma.py:14-31``): there, sharded params must be gathered
under ``deepspeed.zero.GatheredParameters`` before the lerp.  With
``jit``-sharded pytrees the lerp runs directly on the shards — one fused
elementwise op per leaf, no gather.

Reference update: ``param_ema = lerp(param, param_ema, β=0.9999)``
= (1 − β)·param + β·param_ema.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # REAL copies, not aliases: with ``donate_argnums`` on the train step a
    # shared buffer would be donated twice (param leaf + ema leaf), which
    # the TPU runtime rejects (InvalidArgument) on the first step.
    return jax.tree.map(jnp.array, params)


def ema_update(ema_params, params, beta: float = 0.9999):
    return jax.tree.map(
        lambda e, p: e * beta + p * (1.0 - beta), ema_params, params
    )
