"""Train state: params + optimizer state + step + optional EMA, as a pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from biom3_tpu.training.ema import ema_init, ema_update


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, *, with_ema=False):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema_init(params) if with_ema else None,
        )

    def apply_gradients(self, grads, tx: optax.GradientTransformation, *, ema_beta=0.9999):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = (
            ema_update(self.ema_params, params, ema_beta)
            if self.ema_params is not None
            else None
        )
        return self.replace(
            step=self.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
