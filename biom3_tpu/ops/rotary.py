"""Rotary position embeddings (GPT-NeoX / fair-esm style).

ESM2's attention applies rotary embeddings over the full head dim with
half-split rotation: ``rotate_half(x) = concat(-x2, x1)`` where (x1, x2) are
the two halves of the feature dim, and ``cos/sin`` built from
``inv_freq = 10000^(-2i/d)`` duplicated over both halves (fair-esm
``rotary_embedding.py``; the reference loads this tower at
``Stage1_source/model.py:51-57``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotary_cos_sin(seq_len: int, dim: int, dtype=jnp.float32):
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)       # (L, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)    # (L, dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    """Reference formulation (lane split + concat)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_half_mxu(x: jax.Array) -> jax.Array:
    """rotate_half as ``x @ P`` with the ±1 permutation matrix
    P[i, h+i] = 1, P[h+i, i] = -1.

    BIT-EXACT with :func:`rotate_half` (each output lane is ±x_i plus
    exact-zero products), but the half-split lane relayout runs on the MXU
    instead of VPU shuffles — measured 297 ms/fwd cheaper across the 33
    ESM2-650M layers at B=16 (tools/exp_tower_attn.py --rotary-mxu)."""
    D = x.shape[-1]
    h = D // 2
    eye = jnp.eye(h, dtype=x.dtype)
    z = jnp.zeros((h, h), x.dtype)
    P = jnp.block([[z, eye], [-eye, z]])
    return x @ P


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., L, D); cos/sin: (L, D)."""
    return x * cos + _rotate_half_mxu(x) * sin
