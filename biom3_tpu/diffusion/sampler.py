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


def apply_logit_filters(
    logits: jax.Array, *, top_k: int | None = None, top_p: float | None = None
) -> jax.Array:
    """Standard top-k / nucleus filtering over the last axis (serving knobs
    beyond the reference's plain categorical sampling)."""
    if top_k is not None:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest logit still inside the nucleus; the argmax is always kept
        inside = cum - probs < top_p
        inside = inside.at[..., 0].set(True)
        min_keep = jnp.min(
            jnp.where(inside, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < min_keep, -jnp.inf, logits)
    return logits


def make_sampler(
    apply_fn: Callable,
    num_steps: int,
    *,
    temperature: float = 1.0,
    legacy_batch_update: bool = False,
    return_trajectory: bool = False,
    chunk_steps: int | None = None,
    positions_per_step: int = 1,
    top_k: int | None = None,
    top_p: float | None = None,
    head_fn: Callable | None = None,
    apply_takes_positions: bool = False,
    order: str = "path",
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

    ``positions_per_step`` > 1 enables blocked any-order decoding: each
    forward samples the next k path positions independently from the same
    conditional, cutting model calls k-fold.  k=1 (default) is exactly the
    reference's one-position-per-step semantics; k>1 is an approximation
    (positions within a block don't condition on each other).  Certified
    on-chip (PARITY.md "Blocked decoding certification"): at temperature 0
    k=8 is quality-neutral; at temp ≤0.5 use k≤2 for exact-noise-floor
    quality; at temp 1.0 keep k=1 (k=8 measurably mixes modes on
    dependence-heavy tasks).

    ``head_fn(params, h) → logits`` switches to the gather-before-head
    contract: ``apply_fn`` returns the final hidden states (B, L, D) and the
    output head runs only on the k gathered positions per step — identical
    math (the head is per-position), one less (B, L, C) materialization per
    step.  Pair with ``make_fused_apply(cfg, return_hidden=True)`` +
    ``final_head``.  Incompatible with ``legacy_batch_update`` (which needs
    the full logit grid to reproduce Q5).

    The default path gathers only the positions being written (via the
    precomputed inverse permutation) before sampling — same distribution as
    the reference's full-grid ``OneHotCategorical`` + argmax, without
    generating (B, L, C) random bits per step.  ``legacy_batch_update``
    keeps the full-grid sampling so the reference's batched-update quirk
    (SURVEY.md Q5, sampling_analysis.py:254-256) reproduces bit-for-bit.

    ``apply_takes_positions`` switches to the whole-stack-kernel contract
    (``make_stack_apply``): ``apply_fn(params, x, t, z_c, pos (B,k)) →
    (B, k, C)`` logits at the decode positions — embedding, layers, gather
    and head all live inside one Pallas call.

    ``order`` selects the decode ordering (beyond the reference, which is
    random-order only — run_ProteoScribe_sample.py:108):

      * ``"path"`` (default) — the externally sampled permutation, exactly
        the reference's OA-ARDM semantics.
      * ``"confidence"`` — MaskGIT-style easy-first decoding: each forward
        scores ALL still-masked positions and decodes the k where the
        model is most certain (max log-softmax peakedness), so late, hard
        positions condition on confident early ones.  Needs full-grid
        logits, hence one (B, L, C) head per step (head FLOPs are ~0.1%%
        of a layer stack — free) — with ``apply_takes_positions`` the
        kernel is simply passed every position.  The ``path`` argument is
        ignored for ordering.  This is the recommended pairing for blocked
        decoding at temperature > 0: random blocks ignore intra-block
        dependence, confident blocks mostly lack it (certification table
        in PARITY.md).
    """
    if order not in ("path", "confidence"):
        raise ValueError(f"order must be 'path' or 'confidence', got {order!r}")
    if order == "confidence" and legacy_batch_update:
        raise ValueError("legacy_batch_update replays Q5's random-order "
                         "quirk; incompatible with confidence ordering")
    k = positions_per_step
    if num_steps % k != 0:
        raise ValueError(f"num_steps {num_steps} not divisible by k={k}")
    outer_steps = num_steps // k
    chunk = chunk_steps or outer_steps
    chunk = min(chunk, outer_steps)
    if outer_steps % chunk != 0:
        raise ValueError(
            f"outer steps {outer_steps} not divisible by chunk {chunk}"
        )
    if legacy_batch_update and k != 1:
        raise ValueError("legacy_batch_update requires positions_per_step=1")
    if legacy_batch_update and head_fn is not None:
        raise ValueError("legacy_batch_update needs full-grid logits; "
                         "drop head_fn")
    if apply_takes_positions and (legacy_batch_update or head_fn is not None):
        raise ValueError(
            "apply_takes_positions is a complete contract — incompatible "
            "with legacy_batch_update/head_fn"
        )

    def legacy_step(params, z_c, path, carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        logits = apply_fn(params, x, jnp.full((x.shape[0],), t, jnp.int32), z_c)
        logits = logits.astype(jnp.float32)
        if top_k is not None or top_p is not None:
            logits = apply_logit_filters(logits, top_k=top_k, top_p=top_p)
        if temperature == 0.0:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(
                sub, logits / temperature, axis=-1
            ).astype(jnp.int32)
        write = jnp.any(path == t, axis=0)[None, :]  # union over batch (Q5)
        x = jnp.where(write, sampled, x)
        return (x, key), (x if return_trajectory else None)

    def gather_step(params, z_c, inv, carry, i):
        x, key = carry
        B = x.shape[0]
        key, sub = jax.random.split(key)
        t = i * k
        pos = jax.lax.dynamic_slice_in_dim(inv, t, k, axis=1)      # (B, k)
        if apply_takes_positions:
            picked = apply_fn(
                params, x, jnp.full((B,), t, jnp.int32), z_c, pos
            )                                                      # (B, k, C)
        else:
            out = apply_fn(params, x, jnp.full((B,), t, jnp.int32), z_c)
            picked = jnp.take_along_axis(out, pos[..., None], axis=1)
            if head_fn is not None:
                picked = head_fn(params, picked)                   # (B, k, C)
        lg = picked.astype(jnp.float32)
        if top_k is not None or top_p is not None:
            lg = apply_logit_filters(lg, top_k=top_k, top_p=top_p)
        if temperature == 0.0:
            smp = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        else:
            smp = jax.random.categorical(
                sub, lg / temperature, axis=-1
            ).astype(jnp.int32)
        # one-hot broadcast write instead of a 2D scatter (the TPU compiler
        # handles scatter-in-scan pathologically slowly)
        L = x.shape[1]
        oh = pos[:, :, None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
        new_vals = jnp.sum(oh * smp[:, :, None], axis=1).astype(x.dtype)
        x = jnp.where(jnp.any(oh, axis=1), new_vals, x)
        return (x, key), (x if return_trajectory else None)

    def confidence_step(params, z_c, _ordering, carry, i):
        x, filled, key = carry
        B, L = x.shape
        key, sub = jax.random.split(key)
        t = i * k
        t_vec = jnp.full((B,), t, jnp.int32)
        if apply_takes_positions:
            pos_all = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :], (B, L)
            )
            out = apply_fn(params, x, t_vec, z_c, pos_all)         # (B, L, C)
        else:
            out = apply_fn(params, x, t_vec, z_c)
            if head_fn is not None:
                out = head_fn(params, out)                         # (B, L, C)
        full = out.astype(jnp.float32)
        # peakedness of each still-masked position's conditional: the k most
        # certain positions decode this step (easy-first)
        conf = jnp.max(jax.nn.log_softmax(full, axis=-1), axis=-1)  # (B, L)
        conf = jnp.where(filled, -jnp.inf, conf)
        _, pos = jax.lax.top_k(conf, k)                             # (B, k)
        pos = pos.astype(jnp.int32)
        lg = jnp.take_along_axis(full, pos[..., None], axis=1)      # (B, k, C)
        if top_k is not None or top_p is not None:
            lg = apply_logit_filters(lg, top_k=top_k, top_p=top_p)
        if temperature == 0.0:
            smp = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        else:
            smp = jax.random.categorical(
                sub, lg / temperature, axis=-1
            ).astype(jnp.int32)
        oh = pos[:, :, None] == jnp.arange(L, dtype=jnp.int32)[None, None, :]
        new_vals = jnp.sum(oh * smp[:, :, None], axis=1).astype(x.dtype)
        wrote = jnp.any(oh, axis=1)
        x = jnp.where(wrote, new_vals, x)
        return (x, filled | wrote, key), (x if return_trajectory else None)

    @jax.jit
    def run_chunk(params, z_c, path_or_inv, x, filled, key, i0):
        if order == "confidence":
            step, carry = confidence_step, (x, filled, key)
        elif legacy_batch_update:
            step, carry = legacy_step, (x, key)
        else:
            step, carry = gather_step, (x, key)
        carry, traj = jax.lax.scan(
            functools.partial(step, params, z_c, path_or_inv),
            carry,
            i0 + jnp.arange(chunk, dtype=jnp.int32),
        )
        if order == "confidence":
            x, filled, key = carry
        else:
            (x, key) = carry
        return x, filled, key, traj

    def sample(params, z_c, path, key):
        B, L = path.shape
        x = jnp.zeros((B, L), jnp.int32)
        filled = jnp.zeros((B, L), bool)
        # inv[b, t] = position row b samples at step t (path is a permutation)
        path_or_inv = path if legacy_batch_update else jnp.argsort(path, axis=-1)
        trajs = []
        for c in range(outer_steps // chunk):
            x, filled, key, traj = run_chunk(
                params, z_c, path_or_inv, x, filled, key, jnp.int32(c * chunk)
            )
            if return_trajectory:
                trajs.append(traj)
        if return_trajectory:
            return x, jnp.concatenate(trajs, axis=0) if len(trajs) > 1 else trajs[0]
        return x

    return sample


def make_chunk_stepper(
    apply_fn: Callable,
    num_steps: int,
    *,
    chunk_steps: int,
    positions_per_step: int = 1,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float | None = None,
    head_fn: Callable | None = None,
    apply_takes_positions: bool = False,
) -> Callable:
    """Per-row-offset chunk stepper: the device half of continuous batching.

    :func:`make_sampler` advances a whole batch in lockstep from t=0 — rows
    can only join a dispatch at trajectory start, which is why round-3
    serving measured 0.52 row occupancy under concurrent load (half the
    chip denoising padding).  This stepper advances each row from its OWN
    step offset, so rows at different trajectory phases share one
    dispatch and the serving scheduler
    (``biom3_tpu.serving.continuous``) can admit/retire rows at every
    chunk boundary.  Reference hot loop being replaced:
    ``Stage3_source/sampling_analysis.py:204-265`` (one model call per
    step per batch, host-synchronized).

    Returns ``chunk_fn(params, z_c (B,C), inv (B,L), x (B,L) int32,
    t0 (B,) int32, key_data (B,2) uint32, key_data_new (B,2) uint32,
    fresh (B,) bool = t0==0, x_new (B,L) int32 = zeros)
    → (x', key_data')`` advancing every row ``chunk_steps`` outer steps
    (× ``positions_per_step`` positions each) from its offset ``t0``.
    ``fresh``/``x_new`` generalize admission beyond generation: a fresh
    row's state is reset to ``x_new`` (zeros → generate from scratch; a
    partially revealed sequence with ``t0 = num_steps - n_masked`` and
    the masked positions on the ``inv`` tail → exact-mode inpaint row).
    Row semantics:

      * ``inv[b, t]`` is the position row ``b`` decodes at step ``t``
        (the argsort of a sampled path — or, equivalently, any uniform
        random permutation used directly).
      * Rows entering with ``t0 == 0`` are reset on device: ``x`` row
        zeroed to the absorbing state and the RNG row seeded from
        ``key_data_new`` — so the scheduler can keep BOTH carries
        (``x`` and ``key_data``) device-resident across chunks and never
        fetch them between boundaries (each host↔device round-trip costs
        ~0.2 s through the serving tunnel; the carry fetch would burn a
        sync per chunk).  ``key_data_new`` is only read where
        ``t0 == 0`` — stale rows are ignored.
      * Rows with ``t0 >= num_steps`` are inert: they compute (padding
        lanes are free — the batch shape is fixed either way) but never
        write, so finished/free slots cannot corrupt.
      * **Per-row RNG streams** (``key_data`` is each row's raw
        ``jax.random`` key data): a row's tokens depend only on its own
        key, never on which rows happen to share the dispatch — seeded
        requests reproduce bit-exactly under ANY batch composition, with
        no solo-dispatch occupancy cost (categorical sampling via the
        Gumbel-argmax identity on a vmapped per-row stream).
        ``temperature=0`` takes the RNG-free argmax and passes
        ``key_data`` through untouched; per-step math then matches
        :func:`make_sampler`'s gather path bit-for-bit
        (tests/test_continuous.py).
    """
    k = positions_per_step
    if num_steps % k != 0:
        raise ValueError(f"num_steps {num_steps} not divisible by k={k}")
    outer = num_steps // k
    if chunk_steps < 1 or outer % chunk_steps != 0:
        raise ValueError(
            f"outer steps {outer} not divisible by chunk {chunk_steps}"
        )

    @jax.jit
    def chunk_fn(params, z_c, inv, x, t0, key_data, key_data_new,
                 fresh=None, x_new=None):
        B, L = x.shape
        if fresh is None:
            # generate-only contract: rows are fresh iff they start at the
            # trajectory head
            fresh = t0 == 0
        fresh = fresh[:, None]
        # fresh rows enter with x_new as their committed state — the
        # absorbing zeros for generation, a partially revealed sequence
        # for exact-mode inpainting (the row then starts at
        # t0 = num_steps - n_masked and its inv tail lists the masked
        # positions: the reference's resume-from-corruption semantics,
        # Stage3_source/sampling_analysis.py:21-119, as continuous rows)
        x = jnp.where(fresh, 0 if x_new is None else x_new, x)
        key_data = jnp.where(fresh, key_data_new, key_data)

        def step(carry, i):
            x, kd = carry
            t = t0 + i * k                                      # (B,)
            # per-POSITION activity: with k > 1 a row whose remaining
            # step count isn't a k-multiple (inpaint rows start at
            # arbitrary t0) has a final block straddling num_steps — the
            # clamped tail indices must not rewrite earlier positions
            tm = jnp.minimum(t, num_steps - 1)
            steps_k = tm[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
            active = (t[:, None] < num_steps) & (steps_k < num_steps)
            idx = jnp.minimum(steps_k, L - 1)
            pos = jnp.take_along_axis(inv, idx, axis=1)         # (B, k)
            if apply_takes_positions:
                picked = apply_fn(params, x, tm, z_c, pos)      # (B, k, C)
            else:
                out = apply_fn(params, x, tm, z_c)
                picked = jnp.take_along_axis(out, pos[..., None], axis=1)
                if head_fn is not None:
                    picked = head_fn(params, picked)            # (B, k, C)
            lg = picked.astype(jnp.float32)
            if top_k is not None or top_p is not None:
                lg = apply_logit_filters(lg, top_k=top_k, top_p=top_p)
            if temperature == 0.0:
                smp = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            else:
                keys = jax.random.wrap_key_data(kd)             # (B,) keys
                split = jax.vmap(jax.random.split)(keys)        # (B, 2)
                g = jax.vmap(
                    lambda s: jax.random.gumbel(s, lg.shape[1:], jnp.float32)
                )(split[:, 1])
                smp = jnp.argmax(
                    lg / temperature + g, axis=-1
                ).astype(jnp.int32)
                kd = jax.random.key_data(split[:, 0])
            # one-hot broadcast write (scatter-in-scan is pathologically
            # slow on the TPU compiler), masked per position for inert
            # rows and straddling tails
            oh = (
                pos[:, :, None]
                == jnp.arange(L, dtype=jnp.int32)[None, None, :]
            ) & active[:, :, None]
            new_vals = jnp.sum(oh * smp[:, :, None], axis=1).astype(x.dtype)
            wrote = jnp.any(oh, axis=1)
            x = jnp.where(wrote, new_vals, x)
            return (x, kd), None

        (x, key_data), _ = jax.lax.scan(
            step, (x, key_data), jnp.arange(chunk_steps, dtype=jnp.int32)
        )
        return x, key_data

    return chunk_fn


def sample_permutations(key: jax.Array, batch: int, length: int) -> jax.Array:
    """Batch of random sampling orders (ref run_ProteoScribe_sample.py:108)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: jax.random.permutation(k, length))(keys).astype(jnp.int32)


def make_maskgit_sampler(
    apply_fn: Callable,
    num_positions: int,
    *,
    steps: int = 16,
    temperature: float = 1.0,
    choice_temperature: float = 4.5,
    top_k: int | None = None,
    top_p: float | None = None,
    head_fn: Callable | None = None,
    apply_takes_positions: bool = False,
) -> Callable:
    """Parallel iterative re-masking sampler (MaskGIT, Chang et al. 2022) —
    framework extension: L tokens in ``steps`` forwards instead of the
    reference's L (``sampling_analysis.py:204-265``).

    Why this is sound for OA-ARDM: the training objective teaches the model
    to predict EVERY masked position given any t revealed
    (``diffusion/oa_ardm.py``) — exactly the conditional MaskGIT queries.
    Each step samples all still-masked positions from the current
    conditional, commits the most-confident ones per the cosine schedule
    (mask count m_s = ceil(L·cos(π/2·s/S))), and re-masks the rest; the
    per-row timestep fed to the model is the committed count, keeping the
    conditioning inside the training distribution.

    ``choice_temperature``: Gumbel noise scale on the commit ranking
    (annealed to zero over the schedule, the paper's randomness knob —
    0 = pure confidence order; temperature 0 forces it to 0 so greedy
    extraction is deterministic).  Committed tokens never change; shapes
    are static (the schedule enters as a traced per-step scalar, commit
    selection is a per-row rank threshold, not a top-k).

    Same call signature as :func:`make_sampler`'s output — the ``path``
    argument is accepted and ignored (API drop-in for the engine).
    Quality-vs-steps certification: ``tools/certify_blocked.py
    --maskgit-steps``.
    """
    L = num_positions
    if steps < 1 or steps > L:
        raise ValueError(f"steps must be in [1, {L}], got {steps}")
    # mask counts AFTER each step: strictly decreasing to 0, never
    # increasing the committed count by zero (every step commits >= 1)
    import math

    m = [int(math.ceil(L * math.cos(math.pi / 2 * s / steps)))
         for s in range(1, steps + 1)]
    m[-1] = 0
    for i in range(steps - 2, -1, -1):
        m[i] = max(m[i], m[i + 1] + 1)  # monotone, >=1 commit per step
    mask_schedule = jnp.asarray(m, jnp.int32)          # (S,)
    anneal = jnp.asarray(
        [choice_temperature * (1.0 - (s + 1) / steps) for s in range(steps)],
        jnp.float32,
    )

    def step(params, z_c, carry, s):
        x, filled, key = carry
        B = x.shape[0]
        key, k_tok, k_gum = jax.random.split(key, 3)
        committed = jnp.sum(filled, axis=1).astype(jnp.int32)  # (B,)
        # the committed count conditions the model, clamped to the trained
        # range (a fully-revealed inpaint row would otherwise index t == L
        # into the precomputed time-bias table); the UNclamped count stays
        # the keep-target floor below, or that row would shed a position
        t = jnp.minimum(committed, L - 1)
        if apply_takes_positions:
            pos_all = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :], (B, L)
            )
            out = apply_fn(params, x, t, z_c, pos_all)
        else:
            out = apply_fn(params, x, t, z_c)
            if head_fn is not None:
                out = head_fn(params, out)
        lg = out.astype(jnp.float32)                       # (B, L, C)
        if top_k is not None or top_p is not None:
            lg = apply_logit_filters(lg, top_k=top_k, top_p=top_p)
        logp = jax.nn.log_softmax(lg, axis=-1)
        if temperature == 0.0:
            smp = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        else:
            smp = jax.random.categorical(
                k_tok, lg / temperature, axis=-1
            ).astype(jnp.int32)
        conf = jnp.take_along_axis(logp, smp[..., None], axis=-1)[..., 0]
        if temperature != 0.0 and choice_temperature > 0.0:
            conf = conf + anneal[s] * jax.random.gumbel(k_gum, conf.shape)
        # committed positions always outrank candidates and are never
        # re-masked (keep target floors at the committed count — relevant
        # when inpainting starts above the schedule); keep the best overall
        conf = jnp.where(filled, jnp.inf, conf)
        order = jnp.argsort(-conf, axis=1)                 # desc
        rank = jnp.argsort(order, axis=1)                  # rank per position
        target = jnp.maximum(L - mask_schedule[s], committed)  # (B,)
        new_filled = rank < target[:, None]
        x = jnp.where(new_filled, jnp.where(filled, x, smp), 0)
        return (x, new_filled, key), None

    @jax.jit
    def run(params, z_c, key, x0):
        (x, filled, _), _ = jax.lax.scan(
            functools.partial(step, params, z_c),
            (x0, x0 != 0, key),
            jnp.arange(steps, dtype=jnp.int32),
        )
        return x

    def sample(params, z_c, path=None, key=None, *, x0=None):
        """``x0`` (B, L) int32 resumes from a partially revealed sequence
        (inpainting): nonzero positions are committed, absorbing-state 0
        positions get filled over the remaining schedule."""
        if key is None:
            # temperature 0 is fully deterministic (argmax tokens, no
            # gumbel tie-break), so the key value is irrelevant; any
            # stochastic mode without a key is a caller bug — fail fast
            # instead of a TypeError deep inside the scan trace
            if temperature != 0.0:
                raise ValueError(
                    "key is required when temperature > 0 "
                    "(only temperature=0 greedy sampling is key-free)"
                )
            key = jax.random.key(0)
        if x0 is None:
            x0 = jnp.zeros((z_c.shape[0], L), jnp.int32)
        return run(params, z_c, key, jnp.asarray(x0, jnp.int32))

    return sample
