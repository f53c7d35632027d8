"""Inpainting / corruption / autocomplete for ProteoScribe.

Ports of the reference's sampling-analysis surface
(``Stage3_source/sampling_analysis.py``):

  * ``corrupt_samples`` (:96-119) — mask a fraction of a real sequence along
    a random path,
  * ``autocomplete`` — the one-shot ``cond_autocomplete_real_samples``
    (:21-61): predict every masked position in a single forward pass,
  * ``inpaint`` — resume the denoising trajectory from a corrupted state to
    completion (the ``predict_next_index`` loop, compiled as a scan),
  * ``extract_samples_with_labels`` (:65-92) — dataset filtering helper.

All functions take/return shifted (decode-table) token ids.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.diffusion.oa_ardm import mask_realizations, sample_random_paths


def corrupt_samples(
    key: jax.Array,
    real_tokens: jax.Array,
    perc: float,
    num_steps: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mask all but the first ``t = perc·num_steps`` path positions.

    real_tokens: (B, L) shifted ids.  Returns (masked, path, t).
    """
    B, L = real_tokens.shape
    t = jnp.full((B,), jnp.int32(int(num_steps * perc)))
    path = sample_random_paths(key, B, L)
    masked = mask_realizations(real_tokens, path, t)
    return masked, path, t


def autocomplete(
    apply_fn: Callable,
    params,
    masked_tokens: jax.Array,
    z_c: jax.Array,
    t: jax.Array,
    key: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One-shot fill of every masked position (ref :21-61).

    Returns (completed tokens, per-position probabilities).
    """
    logits = apply_fn(params, masked_tokens, t, z_c).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if key is None:
        sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        sampled = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    completed = jnp.where(masked_tokens == 0, sampled, masked_tokens)
    return completed, probs


def make_inpainter(
    apply_fn: Callable,
    num_steps: int,
    *,
    temperature: float = 1.0,
) -> Callable:
    """Compiled resume-from-t denoiser: finishes a corrupted sample's
    trajectory position by position (the reference's predict_next_index loop,
    :122-147 + the generate loop :152-201), as one scan with per-step
    validity masking (steps before t0 are no-ops)."""

    def step(params, z_c, path, t0, carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        logits = apply_fn(
            params, x, jnp.full((x.shape[0],), t, jnp.int32), z_c
        ).astype(jnp.float32)
        if temperature == 0.0:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(
                sub, logits / temperature, axis=-1
            ).astype(jnp.int32)
        active = t >= t0  # (B,) rows whose trajectory has reached step t
        write = (path == t) & active[:, None]
        x = jnp.where(write, sampled, x)
        return (x, key), None

    @jax.jit
    def inpaint(params, masked_tokens, z_c, path, t0, key):
        (x, _), _ = jax.lax.scan(
            functools.partial(step, params, z_c, path, t0),
            (masked_tokens, key),
            jnp.arange(num_steps, dtype=jnp.int32),
        )
        return x

    return inpaint


def extract_samples_with_labels(
    data: np.ndarray,
    labels: np.ndarray,
    target_label: int,
    total_num: int,
    *,
    pad_included: bool = False,
) -> dict:
    """Filter (data, label) pairs by class label (ref :65-92); applies the
    +1 absorbing-state shift unless ids already include it."""
    sel = np.where(np.asarray(labels) == target_label)[0][:total_num]
    samples = np.asarray(data)[sel]
    if not pad_included:
        samples = samples + 1
    return {"sample": list(samples), "label": list(np.asarray(labels)[sel])}
