"""Whole-stack Pallas kernel (ops/pallas/stack_kernel_tpu) vs the Flax graph.

Interpret-mode (CPU) checks: the stack kernel computes embedding → all
layers → final head at the decode positions in one pallas_call; it must
match ``ProteoScribe.apply`` followed by a host-side gather.
"""

import numpy as np
import jax
import jax.numpy as jnp

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.fused_forward import make_stack_apply
from biom3_tpu.models.proteoscribe import ProteoScribe

SMALL = ProteoScribeConfig(
    num_classes=29, dim=64, depth=3, n_blocks=1, heads=4, local_heads=2,
    local_window=32, max_seq_len=128, num_timesteps=128, cond_dim=48,
)


def _setup(rng, B=4):
    model = ProteoScribe(SMALL)
    x = jnp.asarray(rng.integers(0, 29, (B, SMALL.max_seq_len)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 128, (B,)).astype(np.int32))
    z = jnp.asarray(rng.standard_normal((B, SMALL.cond_dim)).astype(np.float32))
    variables = model.init(jax.random.key(0), x[:1], t[:1], z[:1])
    return model, variables, x, t, z


import pytest


@pytest.mark.parametrize(
    "resident",
    [
        # resident=True is 11 s in interpret mode and is the bench's on-chip
        # serving path, drift-gated every round (stack_vs_flax logit delta);
        # the streamed variant keeps the default interpret-mode coverage
        pytest.param(True, marks=pytest.mark.slow),
        False,
    ],
)
def test_stack_kernel_matches_flax_f32(rng, resident):
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)

    ref = model.apply(variables, x, t, z)                    # (B, L, C)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)  # (B, k, C)

    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=resident, interpret=True
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("resident", [True, False])
def test_stack_kernel_rows2_and_k1(rng, resident):
    model, variables, x, t, z = _setup(rng, B=4)
    pos = jnp.asarray(rng.integers(0, SMALL.max_seq_len, (4, 1)).astype(np.int32))
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, rows=2, resident=resident, interpret=True
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stack_kernel_dl_stream_matches_flax(rng):
    """Transposed (d, L) residual-stream variant — removes the per-layer
    activation transposes — must match the Flax graph like the default."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stack_kernel_vpu_opts_match_flax(rng):
    """softmax_opt (scale·log2e folded into local-head q channels, exp2 +
    reciprocal-mul softmax) and ln_onepass (E[x²]−mean² LayerNorm) are
    exact-math rewrites — the dl-stream kernel with both on must still
    match the Flax graph at f32 tolerances."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True,
        softmax_opt=True, ln_onepass=True,
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_stack_kernel_banded_local_matches_flax(rng):
    """local_impl='banded' (one batched matmul over all (head, window)
    strips, edge windows zero-padded + -1e9-masked) is exact vs the
    strips loop: masked keys underflow to exactly 0 after max-subtraction,
    so the f32 kernel must match the Flax graph at the strips tolerances."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True,
        softmax_opt=True, ln_onepass=True, local_impl="banded",
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("impl", ["bandmid", "bandmid2"])
def test_stack_kernel_bandmid_local_matches_flax(rng, impl):
    """local_impl='bandmid' (middle windows batched over pure-slice 3W
    bands — no zero-pad / no mask, the forms implicated in the banded
    Mosaic crash — edge windows as 2W strips) is exact vs the strips
    loop; 'bandmid2' forces the chunked batch path."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True,
        softmax_opt=True, ln_onepass=True, local_impl=impl,
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_stack_kernel_vpu_opts_int8_drift(rng):
    """softmax_opt on the int8 projection path folds into the f32 dequant
    scales — drift vs the f32 Flax graph must stay within the int8 gate."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = np.asarray(jnp.take_along_axis(ref, pos[..., None], axis=1))
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True,
        ff_quant="int8", proj_quant="int8", softmax_opt=True, ln_onepass=True,
    )
    got = np.asarray(apply_fn(variables, x, t, z, pos))
    a = got.reshape(-1, got.shape[-1])
    b = want.reshape(-1, want.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert float(cos.min()) >= 0.999, float(cos.min())


def test_stack_kernel_attn_quant_int8_drift(rng):
    """attn_quant='int8' (local-window dots + pv on the int8 MXU: q/k per
    (head, token), p per (head, query), v per (head, channel) — every
    dequant scale factors exactly out of its contraction) — drift vs the
    f32 Flax graph must stay within the int8 serving gate."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = np.asarray(jnp.take_along_axis(ref, pos[..., None], axis=1))
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=True, stream="dl", interpret=True,
        ff_quant="int8", proj_quant="int8", softmax_opt=True, ln_onepass=True,
        attn_quant="int8",
    )
    got = np.asarray(apply_fn(variables, x, t, z, pos))
    a = got.reshape(-1, got.shape[-1])
    b = want.reshape(-1, want.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert float(cos.min()) >= 0.999, float(cos.min())


def test_stack_kernel_dl_requires_resident():
    import pytest

    from biom3_tpu.ops.pallas.stack_kernel_tpu import fused_stack_logits

    cfg = SMALL
    d, L, depth, ff = cfg.dim, cfg.max_seq_len, cfg.depth, 4 * cfg.dim
    zeros = jnp.zeros
    with pytest.raises(ValueError, match="resident"):
        fused_stack_logits(
            zeros((2, L), jnp.int32), zeros((2, 1), jnp.int32),
            zeros((2, depth, d)), zeros((29, d)), zeros((L, d)),
            zeros((depth, d)), zeros((depth, d)),
            zeros((depth, d, d)), zeros((depth, d, d)), zeros((depth, d, d)),
            zeros((depth, d, d)), zeros((depth, d)),
            zeros((depth, d)), zeros((depth, d)),
            zeros((depth, d, ff)), zeros((depth, ff)),
            zeros((depth, ff, d)), zeros((depth, d)),
            zeros((d,)), zeros((d,)), zeros((d, 29)), zeros((29,)),
            local_heads=cfg.local_heads, heads=cfg.heads,
            window=cfg.local_window, resident=False, stream="dl",
            interpret=True,
        )


def test_stack_kernel_tanh_gelu_close(rng):
    """tanh-GELU serving option stays within its documented deviation
    (4.7e-4 per activation; logits tolerance scaled for accumulation)."""
    model, variables, x, t, z = _setup(rng, B=2)
    pos = jnp.asarray(rng.integers(0, SMALL.max_seq_len, (2, 2)).astype(np.int32))
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, gelu="tanh", interpret=True
    )
    got = apply_fn(variables, x, t, z, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_stack_kernel_bf16_close(rng):
    # CPU XLA cannot execute bf16 dots (DotThunk UNIMPLEMENTED) — the bf16
    # numerics check runs on real TPU via bench.py's stack-vs-flax delta.
    if jax.devices()[0].platform == "cpu":
        import pytest

        pytest.skip("bf16 dot unsupported on CPU backend")
    model, variables, x, t, z = _setup(rng, B=2)
    pos = jnp.asarray(rng.integers(0, SMALL.max_seq_len, (2, 2)).astype(np.int32))
    ref = model.apply(variables, x, t, z)
    want = jnp.take_along_axis(ref, pos[..., None], axis=1)
    apply_fn = make_stack_apply(SMALL, dtype=jnp.bfloat16)
    got = apply_fn(variables, x, t, z, pos)
    # bf16 storage per layer → logits agree to ~1e-1 absolute on toy scales
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.15, atol=0.15)


def test_plan_stack_kernel_budgets():
    """VMEM planner (BACKLOG #7): residency resolves from the config's
    footprint — resident for the reference shape, streamed when the stacked
    weights outgrow VMEM, unsupported when one layer's working set does."""
    from biom3_tpu.models.fused_forward import plan_stack_kernel

    ref = plan_stack_kernel(ProteoScribeConfig())
    assert ref["supported"] and ref["resident"]
    assert 100 <= ref["vmem_limit_mb"] <= 120

    # 4× the parameters (d=1024, depth=32): ~50 MB/layer-pair stacked weights
    # exceed VMEM resident but stream fine
    big = plan_stack_kernel(
        ProteoScribeConfig(dim=1024, depth=32, heads=16, local_heads=8)
    )
    assert big["supported"] and not big["resident"]

    # d=4096: a single layer's weights + working set blow VMEM entirely
    huge = plan_stack_kernel(
        ProteoScribeConfig(dim=4096, depth=8, heads=32, local_heads=16)
    )
    assert not huge["supported"]
    assert "exceeds VMEM" in huge["reason"]

    # non-tileable shapes are rejected with a reason (toy test config)
    toy = plan_stack_kernel(SMALL)
    assert not toy["supported"]
    assert "tileable" in toy["reason"]

    # multi-block graphs aren't covered by the kernel
    nb = plan_stack_kernel(ProteoScribeConfig(n_blocks=2, depth=8))
    assert not nb["supported"] and "n_blocks" in nb["reason"]


def test_stack_apply_raises_outside_plan():
    """Real (non-interpret) stack apply refuses configs the plan rejects —
    the engine gates on the plan so users fall back to fused/Flax paths."""
    import pytest

    from biom3_tpu.models.fused_forward import make_stack_apply

    with pytest.raises(ValueError, match="cannot serve"):
        make_stack_apply(SMALL)  # dim=64 not tileable, interpret=False


def test_stack_sampler_contract(rng):
    """Sampler with apply_takes_positions reproduces the gather-path tokens
    at temperature 0."""
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations

    model, variables, x, t, z = _setup(rng, B=2)
    path = sample_permutations(jax.random.key(1), 2, SMALL.max_seq_len)

    base = make_sampler(model.apply, SMALL.max_seq_len, temperature=0.0)
    want = base(variables, z, path, jax.random.key(2))

    stack_apply = make_stack_apply(SMALL, dtype=jnp.float32, interpret=True)
    fast = make_sampler(
        stack_apply, SMALL.max_seq_len, temperature=0.0,
        apply_takes_positions=True,
    )
    got = fast(variables, z, path, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stack_kernel_int8_ff_drift(rng):
    """int8-FF serving mode (per-token dynamic activation quant x
    per-out-channel int8 weights, int32 MXU accumulation): logits at the
    decode positions must track the f32 Flax graph to >=0.999 cosine —
    the same gate the bench applies on-chip."""
    model, variables, x, t, z = _setup(rng)
    B, k = x.shape[0], 4
    pos = jnp.asarray(
        np.stack([rng.permutation(SMALL.max_seq_len)[:k] for _ in range(B)])
    ).astype(jnp.int32)
    ref = model.apply(variables, x, t, z)
    want = np.asarray(jnp.take_along_axis(ref, pos[..., None], axis=1))

    for stream, proj_quant in (("ld", "none"), ("dl", "none"),
                               ("ld", "int8"), ("dl", "int8")):
        apply_fn = make_stack_apply(
            SMALL, dtype=jnp.float32, resident=True, stream=stream,
            ff_quant="int8", proj_quant=proj_quant, interpret=True,
        )
        got = np.asarray(apply_fn(variables, x, t, z, pos))
        cos = (got * want).sum(-1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
        )
        assert cos.min() > 0.999, (stream, proj_quant, cos.min())


def test_stack_kernel_int8_ff_streamed(rng):
    """int8 FF must also work in the per-layer streamed (non-resident)
    variant — the path large configs resolve to."""
    model, variables, x, t, z = _setup(rng, B=2)
    pos = jnp.asarray(rng.integers(0, SMALL.max_seq_len, (2, 2)).astype(np.int32))
    ref = model.apply(variables, x, t, z)
    want = np.asarray(jnp.take_along_axis(ref, pos[..., None], axis=1))
    apply_fn = make_stack_apply(
        SMALL, dtype=jnp.float32, resident=False, ff_quant="int8",
        interpret=True,
    )
    got = np.asarray(apply_fn(variables, x, t, z, pos))
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
