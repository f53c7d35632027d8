"""Fused training attention block (custom VJP) vs the XLA composition.

Both the forward values and the full gradient set (dxn, dWq, dWk, dWv, dWo,
dbo) must match jax.grad of the reference composition (ops/local_attention +
ops/linear_attention + plain projections) in f32/interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla
from biom3_tpu.ops.pallas.attn_block_tpu import split_attention_block


def xla_attn_block(xn, wq, wk, wv, wo, bo, *, local_heads, heads, window):
    B, L, d = xn.shape
    Dh = d // heads
    split = lambda z: z.reshape(B, L, heads, Dh).transpose(0, 2, 1, 3)
    q, k, v = split(xn @ wq), split(xn @ wk), split(xn @ wv)
    nl = local_heads
    outs = []
    if nl > 0:
        outs.append(local_window_attention_xla(
            q[:, :nl], k[:, :nl], v[:, :nl], window=window))
    if heads - nl > 0:
        outs.append(linear_attention(q[:, nl:], k[:, nl:], v[:, nl:]))
    attn = jnp.concatenate(outs, axis=1)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, L, d)
    return attn @ wo + bo


def _inputs(rng, B=2, L=64, d=64):
    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    return t(B, L, d), t(d, d), t(d, d), t(d, d), t(d, d), t(d)


@pytest.mark.parametrize("local_heads", [0, 2, 4])
def test_attn_block_forward_and_grads_match_xla(local_heads, rng):
    heads, window = 4, 16
    xn, wq, wk, wv, wo, bo = _inputs(rng)
    cot = jnp.asarray(rng.standard_normal(xn.shape).astype(np.float32))

    def loss_ref(xn, wq, wk, wv, wo, bo):
        out = xla_attn_block(
            xn, wq, wk, wv, wo, bo,
            local_heads=local_heads, heads=heads, window=window,
        )
        return jnp.sum(out * cot)

    def loss_fused(xn, wq, wk, wv, wo, bo):
        out = split_attention_block(
            xn, wq, wk, wv, wo, bo,
            local_heads=local_heads, heads=heads, window=window,
            interpret=True,
        )
        return jnp.sum(out * cot)

    args = (xn, wq, wk, wv, wo, bo)
    ref_val, ref_grads = jax.value_and_grad(
        loss_ref, argnums=tuple(range(6))
    )(*args)
    got_val, got_grads = jax.value_and_grad(
        loss_fused, argnums=tuple(range(6))
    )(*args)

    np.testing.assert_allclose(float(got_val), float(ref_val),
                               rtol=2e-4, atol=2e-4)
    names = ["dxn", "dwq", "dwk", "dwv", "dwo", "dbo"]
    for name, g_ref, g_got in zip(names, ref_grads, got_grads):
        scale = max(1e-3, float(jnp.abs(g_ref).max()))
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref),
            atol=5e-4 * scale, rtol=2e-3, err_msg=name,
        )


def test_attn_block_forward_values(rng):
    heads, window, local_heads = 4, 16, 2
    xn, wq, wk, wv, wo, bo = _inputs(rng, B=3, L=48)
    ref = xla_attn_block(
        xn, wq, wk, wv, wo, bo,
        local_heads=local_heads, heads=heads, window=window,
    )
    got = split_attention_block(
        xn, wq, wk, wv, wo, bo,
        local_heads=local_heads, heads=heads, window=window, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # 17 s; kernel fwd+bwd covered default by
# test_attn_block_forward_and_grads_match_xla, and the whole-layer kernel's
# full-model integration (test_layer_block) stays default
def test_proteoscribe_block_impl_matches_xla(rng):
    """Model-level: attn_impl='block-interpret' produces the same param
    tree, logits, and training gradients as the XLA graph."""
    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.models.proteoscribe import ProteoScribe

    cfg = ProteoScribeConfig(
        num_classes=29, dim=64, depth=2, n_blocks=1, heads=4, local_heads=2,
        local_window=16, max_seq_len=64, num_timesteps=64, cond_dim=16,
    )
    x = jnp.asarray(rng.integers(0, 29, (2, 64)).astype(np.int32))
    t = jnp.asarray([3, 40], dtype=jnp.int32)
    z_c = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))

    ref_model = ProteoScribe(cfg)
    params = ref_model.init(jax.random.key(0), x, t, z_c)
    blk_model = ProteoScribe(cfg, attn_impl="block-interpret")
    blk_params = blk_model.init(jax.random.key(0), x, t, z_c)
    assert jax.tree.structure(params) == jax.tree.structure(blk_params)

    ref = ref_model.apply(params, x, t, z_c)
    got = blk_model.apply(params, x, t, z_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)

    cot = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))

    def loss(model, p):
        return jnp.sum(model.apply(p, x, t, z_c) * cot)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(params)
    g_blk = jax.grad(lambda p: loss(blk_model, p))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_b = jax.tree_util.tree_leaves_with_path(g_blk)
    for (pr, gr), (pb, gb) in zip(flat_r, flat_b):
        scale = max(1e-3, float(jnp.abs(gr).max()))
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gr), atol=1e-3 * scale, rtol=5e-3,
            err_msg=jax.tree_util.keystr(pr),
        )
