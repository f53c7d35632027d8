"""Confidence-ordered (MaskGIT-style easy-first) decoding.

Framework extension over the reference's random-order OA-ARDM sampling
(run_ProteoScribe_sample.py:108): each forward decodes the k positions
where the model is most certain.  These tests pin the ordering semantics
with synthetic logits (exact expected decode order), the RNG/contract
equivalence between the full-grid and positional apply contracts, the
whole-stack kernel's every-position gather, and the engine wiring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.diffusion.sampler import make_sampler


def _decode_order_from_traj(traj: np.ndarray) -> list[list[int]]:
    """traj (T, B, L) of x snapshots (absorbing=0, writes nonzero) →
    per-row list of positions in decode order."""
    T, B, L = traj.shape
    prev = np.zeros((B, L), traj.dtype)
    orders: list[list[int]] = [[] for _ in range(B)]
    for s in range(T):
        for b in range(B):
            for p in np.nonzero(traj[s][b] != prev[b])[0]:
                orders[b].append(int(p))
        prev = traj[s]
    return orders


def test_confidence_decodes_most_certain_first():
    """Synthetic logits with per-position peakedness: row 0 is most certain
    at the highest position, row 1 at the lowest — the decode orders must
    be exactly descending-peakedness, per row."""
    B, L, V = 2, 8, 5
    peak = np.linspace(1.0, 8.0, L).astype(np.float32)
    scale = jnp.asarray(np.stack([peak, peak[::-1]]))  # (B, L)

    def apply_fn(params, x, t, z_c):
        # class 1 logit = scale → max log-softmax strictly increases with it
        return jnp.zeros((B, L, V)).at[..., 1].set(scale)

    sampler = make_sampler(
        apply_fn, L, temperature=0.0, order="confidence",
        return_trajectory=True,
    )
    ids, traj = sampler(
        None, None, jnp.zeros((B, L), jnp.int32), jax.random.key(0)
    )
    np.testing.assert_array_equal(np.asarray(ids), np.ones((B, L)))
    orders = _decode_order_from_traj(np.asarray(traj))
    assert orders[0] == list(range(L - 1, -1, -1)), orders[0]
    assert orders[1] == list(range(L)), orders[1]


def test_confidence_blocked_fills_exactly_k_per_step():
    B, L, V, k = 2, 16, 4, 4

    def apply_fn(params, x, t, z_c):
        # peakedness varies with the current x so the order isn't static
        base = jnp.sin(x.astype(jnp.float32) * 0.7 + jnp.arange(L) * 0.3)
        return jnp.zeros((B, L, V)).at[..., 2].set(1.0 + jnp.abs(base))

    sampler = make_sampler(
        apply_fn, L, temperature=0.0, order="confidence",
        positions_per_step=k, return_trajectory=True,
    )
    ids, traj = sampler(
        None, None, jnp.zeros((B, L), jnp.int32), jax.random.key(0)
    )
    traj = np.asarray(traj)
    assert traj.shape == (L // k, B, L)
    filled = (traj != 0).sum(axis=2)  # (T, B): writes are class 2
    for s in range(L // k):
        np.testing.assert_array_equal(filled[s], (s + 1) * k)
    assert (np.asarray(ids) == 2).all()


def test_confidence_temp0_is_key_and_path_independent():
    from test_proteoscribe import _tiny_model_and_params

    cfg, model, params = _tiny_model_and_params()
    sampler = make_sampler(
        model.apply, cfg.num_timesteps, temperature=0.0, order="confidence"
    )
    z_c = jnp.zeros((2, cfg.cond_dim))
    from biom3_tpu.diffusion.sampler import sample_permutations

    path_a = sample_permutations(jax.random.key(1), 2, cfg.max_seq_len)
    path_b = sample_permutations(jax.random.key(2), 2, cfg.max_seq_len)
    x1 = np.asarray(sampler(params, z_c, path_a, jax.random.key(0)))
    x2 = np.asarray(sampler(params, z_c, path_b, jax.random.key(7)))
    np.testing.assert_array_equal(x1, x2)  # ordering comes from the model
    assert x1.min() >= 0 and x1.max() < cfg.num_classes


def test_confidence_positional_contract_matches_full_grid():
    """The apply_takes_positions branch passes every position to the kernel;
    it must consume RNG and decode identically to the full-grid branch."""
    B, L, V = 3, 16, 6

    def grid(x, t):
        return jnp.sin(
            x[..., None].astype(jnp.float32) * 0.37
            + t[:, None, None].astype(jnp.float32) * 0.11
            + jnp.arange(V) * 0.53
        )

    full_fn = lambda params, x, t, z_c: grid(x, t)
    pos_fn = lambda params, x, t, z_c, pos: jnp.take_along_axis(
        grid(x, t), pos[..., None], axis=1
    )
    kwargs = dict(temperature=1.0, order="confidence", positions_per_step=2)
    s_full = make_sampler(full_fn, L, **kwargs)
    s_pos = make_sampler(pos_fn, L, apply_takes_positions=True, **kwargs)
    path = jnp.zeros((B, L), jnp.int32)
    a = np.asarray(s_full(None, None, path, jax.random.key(5)))
    b = np.asarray(s_pos(None, None, path, jax.random.key(5)))
    np.testing.assert_array_equal(a, b)


def test_stack_apply_every_position_gather(rng):
    """Confidence ordering passes pos=arange(L) to the whole-stack kernel —
    the k=L gather must reproduce the Flax full logit grid."""
    from test_stack_kernel import SMALL, _setup
    from biom3_tpu.models.fused_forward import make_stack_apply

    model, variables, x, t, z = _setup(rng, B=2)
    L = SMALL.max_seq_len
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (2, L))
    ref = model.apply(variables, x, t, z)  # (B, L, C)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=False, interpret=True
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_maskgit_one_step_equals_one_shot_argmax():
    """steps=1 must degenerate to a single forward committing every
    position at its argmax — i.e. exactly the autocomplete conditional."""
    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    B, L, V = 2, 12, 7

    def apply_fn(params, x, t, z_c):
        return jnp.sin(
            x[..., None].astype(jnp.float32) * 0.3
            + jnp.arange(L, dtype=jnp.float32)[None, :, None] * 0.7
            + jnp.arange(V) * 1.3
        )

    sampler = make_maskgit_sampler(apply_fn, L, steps=1, temperature=0.0)
    z_c = jnp.zeros((B, 4))
    ids = np.asarray(sampler(None, z_c, None, jax.random.key(0)))
    want = np.asarray(jnp.argmax(
        apply_fn(None, jnp.zeros((B, L), jnp.int32),
                 jnp.zeros((B,), jnp.int32), z_c), axis=-1))
    np.testing.assert_array_equal(ids, want)


def test_maskgit_fills_everything_and_is_temp0_deterministic():
    from biom3_tpu.diffusion.sampler import make_maskgit_sampler
    from test_proteoscribe import _tiny_model_and_params

    cfg, model, params = _tiny_model_and_params()
    sampler = make_maskgit_sampler(
        model.apply, cfg.max_seq_len, steps=8, temperature=0.0
    )
    z_c = jnp.zeros((2, cfg.cond_dim))
    a = np.asarray(sampler(params, z_c, None, jax.random.key(0)))
    b = np.asarray(sampler(params, z_c, None, jax.random.key(9)))
    np.testing.assert_array_equal(a, b)  # temp 0: key-independent
    assert a.shape == (2, cfg.max_seq_len)
    assert a.min() >= 0 and a.max() < cfg.num_classes


def test_maskgit_positional_contract_matches_full_grid():
    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    B, L, V = 3, 16, 6

    def grid(x, t):
        return jnp.sin(
            x[..., None].astype(jnp.float32) * 0.37
            + t[:, None, None].astype(jnp.float32) * 0.11
            + jnp.arange(V) * 0.53
        )

    full_fn = lambda params, x, t, z_c: grid(x, t)
    pos_fn = lambda params, x, t, z_c, pos: jnp.take_along_axis(
        grid(x, t), pos[..., None], axis=1
    )
    kw = dict(steps=4, temperature=1.0, choice_temperature=4.5)
    s_full = make_maskgit_sampler(full_fn, L, **kw)
    s_pos = make_maskgit_sampler(pos_fn, L, apply_takes_positions=True, **kw)
    z_c = jnp.zeros((B, 4))
    a = np.asarray(s_full(None, z_c, None, jax.random.key(5)))
    b = np.asarray(s_pos(None, z_c, None, jax.random.key(5)))
    np.testing.assert_array_equal(a, b)


def test_maskgit_inpaints_from_partial_sequence():
    """x0 resumes: committed (nonzero) positions survive untouched, masked
    ones fill; a fully revealed row is a no-op even though its committed
    count exceeds every keep target in the schedule."""
    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    B, L, V = 3, 12, 6

    def apply_fn(params, x, t, z_c):
        return jnp.zeros((B, L, V)).at[..., 1].set(1.0)

    sampler = make_maskgit_sampler(apply_fn, L, steps=4, temperature=0.0)
    x0 = jnp.asarray(np.array(
        [[0] * L,
         [5] * 6 + [0] * 6,
         [4] * L], np.int32))
    out = np.asarray(sampler(None, jnp.zeros((B, 2)), None,
                             jax.random.key(0), x0=x0))
    np.testing.assert_array_equal(out[0], np.ones(L))
    np.testing.assert_array_equal(out[1], [5] * 6 + [1] * 6)
    np.testing.assert_array_equal(out[2], [4] * L)


def test_maskgit_rejects_bad_steps():
    import pytest

    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    with pytest.raises(ValueError, match="steps"):
        make_maskgit_sampler(lambda *a: None, 16, steps=0)
    with pytest.raises(ValueError, match="steps"):
        make_maskgit_sampler(lambda *a: None, 16, steps=17)


def test_maskgit_keyless_greedy_works_stochastic_requires_key():
    """temperature=0 is deterministic, so sample() must run without a key
    (docstring contract); any stochastic mode without a key fails fast at
    entry, not as a TypeError inside the scan trace."""
    import pytest

    from biom3_tpu.diffusion.sampler import make_maskgit_sampler

    B, L, V = 2, 12, 7

    def apply_fn(params, x, t, z_c):
        return jnp.sin(
            x[..., None].astype(jnp.float32) * 0.3
            + jnp.arange(L, dtype=jnp.float32)[None, :, None] * 0.7
            + jnp.arange(V) * 1.3
        )

    z_c = jnp.zeros((B, 4))
    greedy = make_maskgit_sampler(apply_fn, L, steps=4, temperature=0.0)
    keyless = np.asarray(greedy(None, z_c))
    keyed = np.asarray(greedy(None, z_c, None, jax.random.key(3)))
    np.testing.assert_array_equal(keyless, keyed)

    stoch = make_maskgit_sampler(apply_fn, L, steps=4, temperature=1.0)
    with pytest.raises(ValueError, match="key is required"):
        stoch(None, z_c)


def test_engine_maskgit_mode(tmp_path):
    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from test_cli import TINY_STAGE3

    engine = ProteoScribeEngine(
        Config(TINY_STAGE3), None, temperature=0.0,
        sampler_mode="maskgit", maskgit_steps=8,
    )
    z_c = np.zeros((2, 16), np.float32)
    out = engine.generate_sequences(z_c, num_replicas=2, batch_size=2, seed=0)
    for seqs in out.values():
        assert len(seqs) == 2
        for s in seqs:
            assert isinstance(s, str)
            assert "<START>" not in s and "<PAD>" not in s


def test_engine_confidence_order(tmp_path):
    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from test_cli import TINY_STAGE3

    engine = ProteoScribeEngine(
        Config(TINY_STAGE3), None, temperature=0.0, decode_order="confidence"
    )
    z_c = np.zeros((2, 16), np.float32)
    out = engine.generate_sequences(z_c, num_replicas=2, batch_size=2, seed=0)
    assert set(out) == {"replica_0", "replica_1"}
    for seqs in out.values():
        assert len(seqs) == 2
        for s in seqs:
            assert isinstance(s, str)
            assert "<START>" not in s and "<PAD>" not in s
    # temperature 0 + confidence ordering: replicas collapse to the argmax
    # trajectory (ordering and tokens both come from the model alone)
    assert out["replica_0"] == out["replica_1"]
