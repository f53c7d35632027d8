"""Stage-2 Facilitator: weight-normalized MLP mapping z_text → z_protein.

Reference graph (``Stage1_source/model.py:473-493``):
    weight_norm(Linear(in, hid), dim=None) → GELU → Dropout → weight_norm(Linear(hid, out), dim=None)

``weight_norm(dim=None)`` reparameterizes the full weight matrix with a single
scalar gain: ``W = g · V / ||V||_F``.  We keep the same (g, v) parameterization
so the published checkpoint converts losslessly and training matches the
reference's optimization geometry.

Losses (``model.py:495-554``): MSE, and an RBF-kernel MMD whose kernel is
``exp(-mean((x-y)², axis=-1) / dim)`` — note the double 1/dim (mean *and*
divide), reproduced exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from biom3_tpu.config import FacilitatorConfig


class WeightNormDense(nn.Module):
    """Linear layer with torch-style weight_norm(dim=None) parameterization.

    Params: ``v`` (out, in) — stored in torch (out,in) layout for converter
    simplicity — scalar gain ``g``, and bias ``b``.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (self.features, in_dim),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v).reshape(shape),
            (),
        )
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        w = v * (g / jnp.linalg.norm(v))
        return x @ w.T + b


class Facilitator(nn.Module):
    """z_t (B, in_dim) → z_c (B, out_dim)."""

    config: FacilitatorConfig

    @nn.compact
    def __call__(self, z_t: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        h = WeightNormDense(cfg.hid_dim, name="fc1")(z_t)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        return WeightNormDense(cfg.out_dim, name="fc2")(h)


# --- losses (pure functions; ref Stage1_source/model.py:495-554) -----------


def mse_loss(output: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((output - target) ** 2)


def _rbf_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    """exp(-mean((x-y)², axis=-1) / dim); ref model.py:511-533."""
    dim = x.shape[-1]
    sq = jnp.mean((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return jnp.exp(-sq / dim)


def mmd_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Maximum Mean Discrepancy with the reference RBF kernel (model.py:535-554)."""
    return (
        _rbf_kernel(x, x).mean()
        + _rbf_kernel(y, y).mean()
        - 2.0 * _rbf_kernel(x, y).mean()
    )
