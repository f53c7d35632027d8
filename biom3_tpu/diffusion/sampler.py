"""Compiled denoising sampler for ProteoScribe.

The reference's sampling loop (``Stage3_source/sampling_analysis.py:204-265``)
runs 1024 sequential model calls from Python, synchronizing with the host
every step (``.cpu()`` appends).  Here the whole trajectory is a single
``jax.lax.scan`` inside one jit: zero host round-trips, categorical sampling
with ``jax.random`` on device, and the batch dimension carried through every
step.

Semantics (matching the reference's math, not its bugs):

  * start from all-absorbing x = 0, t = 0;
  * at step t, forward the model, sample a token per position from the
    per-position categorical (the reference samples ``OneHotCategorical`` and
    argmaxes the one-hot — identical in distribution), and write the sampled
    token only at each row's position σ_row⁻¹(t);
  * ``temperature=0`` takes the argmax (RNG-free, used for parity tests).

``legacy_batch_update=True`` reproduces the reference's batched-update quirk
(SURVEY.md Q5; ``sampling_analysis.py:254-256``): at step t the update is
applied at the *union* of all rows' step-t positions (each row with its own
sampled values).  Parity with the reference batched sampler requires this
flag; the default is the corrected per-row scatter, which equals the
reference's (correct) single-sample path (``:152-201``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def make_sampler(
    apply_fn: Callable,
    num_steps: int,
    *,
    temperature: float = 1.0,
    legacy_batch_update: bool = False,
    return_trajectory: bool = False,
    chunk_steps: int | None = None,
) -> Callable:
    """Build a jittable sampler.

    apply_fn(params, x (B,L) int32, t (B,) int32, z_c (B,C)) → logits (B,L,V).

    Returns ``sample(params, z_c, path, key) → (B, L) int32`` decode-table ids
    (or ``(final, trajectory)`` with trajectory (T, B, L) when
    ``return_trajectory`` — the reference's animation/analysis surface).

    ``chunk_steps`` splits the trajectory into several device dispatches of
    that many scan steps each (bounding single-execution wall-clock — some
    runtimes cap it); one compiled chunk function is reused with a dynamic
    time offset, so compile cost is unchanged.
    """
    chunk = chunk_steps or num_steps
    if num_steps % chunk != 0:
        raise ValueError(f"num_steps {num_steps} not divisible by chunk {chunk}")

    def step(params, z_c, path, carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        logits = apply_fn(params, x, jnp.full((x.shape[0],), t, jnp.int32), z_c)
        logits = logits.astype(jnp.float32)
        if temperature == 0.0:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(
                sub, logits / temperature, axis=-1
            ).astype(jnp.int32)
        at_t = path == t  # (B, L); one True per row
        if legacy_batch_update:
            write = jnp.any(at_t, axis=0)[None, :]  # union over batch (Q5)
        else:
            write = at_t
        x = jnp.where(write, sampled, x)
        return (x, key), (x if return_trajectory else None)

    @jax.jit
    def run_chunk(params, z_c, path, x, key, t0):
        (x, key), traj = jax.lax.scan(
            functools.partial(step, params, z_c, path),
            (x, key),
            t0 + jnp.arange(chunk, dtype=jnp.int32),
        )
        return x, key, traj

    def sample(params, z_c, path, key):
        B, L = path.shape
        x = jnp.zeros((B, L), jnp.int32)
        trajs = []
        for c in range(num_steps // chunk):
            x, key, traj = run_chunk(
                params, z_c, path, x, key, jnp.int32(c * chunk)
            )
            if return_trajectory:
                trajs.append(traj)
        if return_trajectory:
            return x, jnp.concatenate(trajs, axis=0) if len(trajs) > 1 else trajs[0]
        return x

    return sample


def sample_permutations(key: jax.Array, batch: int, length: int) -> jax.Array:
    """Batch of random sampling orders (ref run_ProteoScribe_sample.py:108)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: jax.random.permutation(k, length))(keys).astype(jnp.int32)
