"""Order-Agnostic ARDM (any-order autoregressive diffusion) objective.

Vectorized TPU re-implementation of the reference OA-ARDM math
(``Stage3_source/transformer_training_helper.py``):

  * per-row random sampling path σ (a permutation of [0, L)),
  * a random timestep t ~ U[0, L] (inclusive; ref :101-123),
  * positions with σ < t keep their true token; the rest become the absorbing
    state 0 (ref ``mask_realizations:211-231`` — there a per-row Python loop,
    here one ``jnp.where``),
  * ELBO: sum of log p(x_true) over *unsampled* positions × 1/(L − t + 1),
    negated and batch-averaged (ref :159-184, 458-554).

Token ids entering here are already the +1-shifted training ids
(``Stage3Vocab.shift_for_model``; ref ``create_token_labels:187-208``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sample_random_paths(key: jax.Array, batch: int, length: int) -> jax.Array:
    """(B, L) int32 — an independent permutation of [0, L) per row
    (ref sample_random_path:16-32)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: jax.random.permutation(k, length))(keys).astype(jnp.int32)


def sample_timesteps(
    key: jax.Array,
    batch: int,
    length: int,
    *,
    option: str = "random",
    decay_rate: float = 0.005,
) -> jax.Array:
    """(B,) int32 in [0, L] inclusive (ref sample_random_index_for_sampling:101-123).

    ``option="weighted"`` draws from the exponentially-decaying distribution
    of the reference's ``exp_weight_time_sample`` (:82-99) — in the reference
    that branch crashes on a misnamed class (SURVEY.md Q2); here it works.
    """
    if option == "random":
        return jax.random.randint(key, (batch,), 0, length + 1, dtype=jnp.int32)
    if option == "weighted":
        logits = -decay_rate * jnp.arange(length + 1, dtype=jnp.float32)
        return jax.random.categorical(key, logits[None, :], axis=-1, shape=(batch,)).astype(
            jnp.int32
        )
    raise ValueError(f"unknown timestep sampling option {option!r}")


def mask_realizations(
    real_tokens: jax.Array, path: jax.Array, t: jax.Array
) -> jax.Array:
    """Keep tokens where σ < t, absorbing state 0 elsewhere.

    real_tokens: (B, L) shifted ids; path: (B, L); t: (B,).
    """
    keep = path < t[:, None]
    return jnp.where(keep, real_tokens, 0)


def oa_ardm_loss(
    logits: jax.Array,
    real_tokens: jax.Array,
    masked_tokens: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Negative OA-ARDM ELBO estimate.

    logits: (B, L, C); real_tokens/masked_tokens: (B, L); t: (B,).
    Matches ref: log-prob of true tokens summed over absorbing positions
    (masked == 0), weighted by 1/(L − t + 1), −mean over batch.
    """
    L = real_tokens.shape[1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp_true = jnp.take_along_axis(
        logp, real_tokens[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    unsampled = (masked_tokens == 0).astype(jnp.float32)
    per_row = jnp.sum(logp_true * unsampled, axis=-1)
    weighted = per_row / (L - t.astype(jnp.float32) + 1.0)
    return -jnp.mean(weighted)


def oa_ardm_step(
    apply_fn: Callable,
    params,
    key: jax.Array,
    real_tokens: jax.Array,
    z_c: jax.Array,
) -> jax.Array:
    """One full objective evaluation: draw (σ, t), mask, forward, loss."""
    B, L = real_tokens.shape
    k_path, k_t = jax.random.split(key)
    path = sample_random_paths(k_path, B, L)
    t = sample_timesteps(k_t, B, L)
    masked = mask_realizations(real_tokens, path, t)
    logits = apply_fn(params, masked, t, z_c)
    return oa_ardm_loss(logits, real_tokens, masked, t)
