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
    apply_takes_positions: bool = False,
    chunk_steps: int | None = None,
    order: str = "path",
    early_exit: bool = False,
    top_k: int | None = None,
    top_p: float | None = None,
) -> Callable:
    """Compiled resume-from-t denoiser: finishes a corrupted sample's
    trajectory position by position (the reference's predict_next_index loop,
    :122-147 + the generate loop :152-201), as one scan with per-step
    validity masking (steps before t0 are no-ops).

    ``apply_takes_positions=True`` switches to the whole-stack-kernel
    contract (``apply(params, x, t, z_c, pos) → (B, k, C)``) — each step
    decodes exactly one path position, so the inpainter gets the same
    gather-before-head fast path as the sampler.  ``chunk_steps`` splits
    the trajectory into several device dispatches (tunnel runtimes kill
    ~60 s single executions), same contract as ``make_sampler``.

    ``order="confidence"`` (framework extension, mirrors the sampler's):
    each step fills the most-certain still-masked position instead of the
    path's next one.  The ``path``/``t0`` arguments are then ignored for
    ordering — masked positions are read off the absorbing state (id 0,
    which ``mask_realizations`` writes), the per-row timestep fed to the
    model is the count of revealed positions, and rows that finish early
    (or arrive fully revealed) no-op for the remaining steps.

    ``early_exit=True`` (requires ``chunk_steps``) stops dispatching once
    no absorbing-state position remains (host check between chunks).  In
    confidence order every step fills one position per row, so a batch
    with at most ``m`` masked positions costs ``ceil(m/chunk)`` chunks
    instead of the full trajectory — the serving path for user-masked
    inpainting.  Results are identical to the full run: remaining steps
    are no-ops once every position is revealed, in both orders."""
    if order not in ("path", "confidence"):
        raise ValueError(f"order must be 'path' or 'confidence', got {order!r}")

    from biom3_tpu.diffusion.sampler import apply_logit_filters

    def filt(lg):
        # same top-k/nucleus knobs as make_sampler, so an engine's
        # configured filters apply to inpainting fills too
        if top_k is not None or top_p is not None:
            return apply_logit_filters(lg, top_k=top_k, top_p=top_p)
        return lg

    def step(params, z_c, path, t0, carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        active = t >= t0  # (B,) rows whose trajectory has reached step t
        write = (path == t) & active[:, None]
        if apply_takes_positions:
            # each row decodes its single path==t position this step
            pos = jnp.argmax(path == t, axis=1).astype(jnp.int32)
            logits = apply_fn(
                params, x, tb, z_c, pos[:, None]
            ).astype(jnp.float32)                       # (B, 1, C)
        else:
            logits = apply_fn(params, x, tb, z_c).astype(jnp.float32)
        logits = filt(logits)
        if temperature == 0.0:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(
                sub, logits / temperature, axis=-1
            ).astype(jnp.int32)
        # full-logits path: sampled (B, L); positions path: (B, 1),
        # broadcast across L — write is one-hot per row either way
        x = jnp.where(write, sampled, x)
        return (x, key), None

    def conf_step(params, z_c, carry, _):
        x, filled, key = carry
        B, L = x.shape
        key, sub = jax.random.split(key)
        # clamp the per-row revealed count to the trained range: a fully
        # revealed row would otherwise feed t == L one past the model's
        # precomputed time-bias table (same guard as make_maskgit_sampler)
        t = jnp.minimum(
            jnp.sum(filled, axis=1).astype(jnp.int32), x.shape[1] - 1
        )
        if apply_takes_positions:
            pos_all = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :], (B, L)
            )
            out = apply_fn(params, x, t, z_c, pos_all)
        else:
            out = apply_fn(params, x, t, z_c)
        full = out.astype(jnp.float32)                  # (B, L, C)
        conf = jnp.max(jax.nn.log_softmax(full, axis=-1), axis=-1)
        conf = jnp.where(filled, -jnp.inf, conf)
        pos = jnp.argmax(conf, axis=1).astype(jnp.int32)  # (B,)
        lg = filt(
            jnp.take_along_axis(full, pos[:, None, None], axis=1)[:, 0]
        )
        if temperature == 0.0:
            smp = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        else:
            smp = jax.random.categorical(
                sub, lg / temperature, axis=-1
            ).astype(jnp.int32)
        oh = pos[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
        # finished rows (nothing masked) must no-op: argmax over all -inf
        # confidences returns an arbitrary position
        wrote = oh & ~filled & jnp.any(~filled, axis=1)[:, None]
        x = jnp.where(wrote, smp[:, None], x)
        return (x, filled | wrote, key), None

    if chunk_steps and num_steps % chunk_steps != 0:
        raise ValueError(
            f"num_steps {num_steps} not divisible by chunk_steps "
            f"{chunk_steps}"
        )
    chunk = chunk_steps or None
    if early_exit and chunk is None:
        raise ValueError("early_exit needs chunk_steps (the exit check "
                         "runs between chunk dispatches)")

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(params, z_c, path, t0, carry, start, n):
        if order == "confidence":
            return jax.lax.scan(
                functools.partial(conf_step, params, z_c),
                carry,
                start + jnp.arange(n, dtype=jnp.int32),
            )[0]
        return jax.lax.scan(
            functools.partial(step, params, z_c, path, t0),
            carry,
            start + jnp.arange(n, dtype=jnp.int32),
        )[0]

    def inpaint(params, masked_tokens, z_c, path, t0, key):
        if order == "confidence":
            carry = (masked_tokens, masked_tokens != 0, key)
        else:
            carry = (masked_tokens, key)
        if chunk is None:
            return run_chunk(params, z_c, path, t0, carry,
                             jnp.int32(0), num_steps)[0]
        for c in range(num_steps // chunk):
            if early_exit and not np.any(np.asarray(carry[0]) == 0):
                break
            carry = run_chunk(params, z_c, path, t0, carry,
                              jnp.int32(c * chunk), chunk)
        return carry[0]

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
