"""Fused Pallas layer kernels vs the Flax ProteoScribe graph.

Interpret-mode (CPU) equality in f32; the on-chip delta is additionally
recorded by ``bench.py`` (``attn_pallas_vs_xla_max_abs_delta``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.fused_forward import make_fused_apply
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.ops.pallas.fused_layer_tpu import fused_attn_half, fused_ff_half

SMALL = ProteoScribeConfig(
    num_classes=29, dim=64, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=32, max_seq_len=128, num_timesteps=128, cond_dim=48,
)


def _inputs(rng, B=2):
    x = jnp.asarray(rng.integers(0, 29, (B, SMALL.max_seq_len)).astype(np.int32))
    t = jnp.asarray([3, 100], jnp.int32)
    z = jnp.asarray(rng.standard_normal((B, SMALL.cond_dim)).astype(np.float32))
    return x, t, z


def test_fused_apply_matches_flax_f32(rng):
    model = ProteoScribe(SMALL)
    x, t, z = _inputs(rng)
    params = model.init(jax.random.key(0), x, t, z)
    ref = model.apply(params, x, t, z)
    fused = make_fused_apply(SMALL, dtype=jnp.float32, interpret=True)
    got = fused(params, x, t, z)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fused_apply_unconditional(rng):
    model = ProteoScribe(SMALL, conditional=False)
    x, t, _ = _inputs(rng)
    params = model.init(jax.random.key(0), x, t, None)
    ref = model.apply(params, x, t, None)
    fused = make_fused_apply(
        SMALL, dtype=jnp.float32, conditional=False, interpret=True
    )
    got = fused(params, x, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fused_attn_half_edge_windows(rng):
    """First/last windows must mask the absent neighbor (look-around ±1)."""
    from biom3_tpu.ops.linear_attention import linear_attention
    from biom3_tpu.ops.local_attention import local_window_attention

    B, L, d, H, nl, W = 2, 128, 64, 4, 2, 32
    Dh = d // H
    x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    ln_s = jnp.asarray(rng.standard_normal(d).astype(np.float32)) * 0.1 + 1
    ln_b = jnp.zeros(d, jnp.float32)
    mk = lambda: jnp.asarray(rng.standard_normal((d, d)).astype(np.float32)) * 0.1
    wq, wk, wv, wo = mk(), mk(), mk(), mk()
    bo = jnp.asarray(rng.standard_normal(d).astype(np.float32)) * 0.1

    got = fused_attn_half(
        x, bias, ln_s, ln_b, wq, wk, wv, wo, bo,
        local_heads=nl, heads=H, window=W, interpret=True,
    )

    # reference: same math with the existing (tested) XLA ops
    xb = x + bias[:, None, :]
    mean = xb.mean(-1, keepdims=True)
    var = ((xb - mean) ** 2).mean(-1, keepdims=True)
    xn = (xb - mean) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
    split = lambda z: z.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
    q, k, v = split(xn @ wq), split(xn @ wk), split(xn @ wv)
    lo = local_window_attention(q[:, :nl], k[:, :nl], v[:, :nl], window=W)
    li = linear_attention(q[:, nl:], k[:, nl:], v[:, nl:])
    attn = jnp.concatenate([lo, li], axis=1).transpose(0, 2, 1, 3).reshape(B, L, d)
    ref = xb + attn @ wo + bo

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_ff_half(rng):
    B, L, d, ff = 2, 128, 64, 256
    x = jnp.asarray(rng.standard_normal((B, L, d)).astype(np.float32))
    ln_s = jnp.ones(d, jnp.float32)
    ln_b = jnp.zeros(d, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, ff)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.standard_normal(ff).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.standard_normal((ff, d)).astype(np.float32)) * 0.1
    b2 = jnp.zeros(d, jnp.float32)
    got = fused_ff_half(x, ln_s, ln_b, w1, b1, w2, b2, block_l=64, interpret=True)

    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    ref = x + jax.nn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gather_before_head_sampler_matches_plain(rng):
    """head_fn (gather-before-head) must not change sampling results:
    temp-0 sequences identical to the plain full-logits sampler."""
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
    from biom3_tpu.models.fused_forward import final_head

    model = ProteoScribe(SMALL)
    x, t, z = _inputs(rng)
    params = model.init(jax.random.key(0), x, t, z)
    B = 2
    z_c = jnp.asarray(rng.standard_normal((B, SMALL.cond_dim)).astype(np.float32))
    path = sample_permutations(jax.random.key(1), B, SMALL.max_seq_len)

    plain = make_sampler(model.apply, SMALL.num_timesteps, temperature=0.0)
    hidden_apply = make_fused_apply(
        SMALL, dtype=jnp.float32, interpret=True, return_hidden=True
    )
    split = make_sampler(
        hidden_apply, SMALL.num_timesteps, temperature=0.0,
        head_fn=lambda v, h: final_head(
            SMALL, v["params"] if "params" in v else v, h
        ),
    )
    a = np.asarray(plain(params, z_c, path, jax.random.key(2)))
    b = np.asarray(split(params, z_c, path, jax.random.key(2)))
    np.testing.assert_array_equal(a, b)


def test_time_table_matches_per_step_mlp(rng):
    """Precomputed time-bias table == per-step time MLP."""
    model = ProteoScribe(SMALL)
    x, t, z = _inputs(rng)
    params = model.init(jax.random.key(0), x, t, z)
    with_table = make_fused_apply(
        SMALL, dtype=jnp.float32, interpret=True, time_table=True
    )(params, x, t, z)
    without = make_fused_apply(
        SMALL, dtype=jnp.float32, interpret=True, time_table=False
    )(params, x, t, z)
    np.testing.assert_allclose(
        np.asarray(with_table), np.asarray(without), rtol=2e-5, atol=2e-5
    )
