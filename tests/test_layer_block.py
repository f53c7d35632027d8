"""Whole-layer custom VJP vs the Flax TransformerLayer (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import TransformerLayer
from biom3_tpu.ops.pallas.layer_block_tpu import transformer_layer_block

CFG = ProteoScribeConfig(
    num_classes=29, dim=64, depth=1, n_blocks=1, heads=4, local_heads=2,
    local_window=16, max_seq_len=64, num_timesteps=64, cond_dim=16,
)


def _layer_and_params(rng, cfg=CFG):
    layer = TransformerLayer(cfg)
    xb = jnp.asarray(rng.standard_normal((2, 64, cfg.dim)).astype(np.float32) * 0.5)
    params = layer.init(jax.random.key(0), xb)
    return layer, params, xb


def _kernel_args(params):
    p = params["params"]
    return dict(
        wq=p["attn"]["to_q_kernel"], wk=p["attn"]["to_k_kernel"],
        wv=p["attn"]["to_v_kernel"],
        wo=p["attn"]["to_out"]["kernel"], bo=p["attn"]["to_out"]["bias"],
        ls1=p["attn_norm"]["scale"], lb1=p["attn_norm"]["bias"],
        ls2=p["ff_norm"]["scale"], lb2=p["ff_norm"]["bias"],
        w1=p["ff_w1"]["kernel"], b1=p["ff_w1"]["bias"],
        w2=p["ff_w2"]["kernel"], b2=p["ff_w2"]["bias"],
    )


@pytest.mark.parametrize("local_heads", [2, 0, 4])
def test_layer_block_forward_matches_flax(local_heads, rng):
    cfg = ProteoScribeConfig(
        num_classes=29, dim=64, depth=1, n_blocks=1, heads=4,
        local_heads=local_heads, local_window=16, max_seq_len=64,
        num_timesteps=64, cond_dim=16,
    )
    layer, params, xb = _layer_and_params(rng, cfg)
    ref = layer.apply(params, xb)
    got = transformer_layer_block(
        xb, **_kernel_args(params),
        local_heads=cfg.local_heads, heads=cfg.heads,
        window=cfg.local_window, ff_block_l=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_layer_block_grads_match_flax(rng):
    layer, params, xb = _layer_and_params(rng)
    cot = jnp.asarray(rng.standard_normal(xb.shape).astype(np.float32))

    def loss_ref(params, xb):
        return jnp.sum(layer.apply(params, xb) * cot)

    def loss_fused(params, xb):
        out = transformer_layer_block(
            xb, **_kernel_args(params),
            local_heads=CFG.local_heads, heads=CFG.heads,
            window=CFG.local_window, ff_block_l=32, interpret=True,
        )
        return jnp.sum(out * cot)

    (ref_val, ref_gp), ref_gx = (
        jax.value_and_grad(loss_ref, argnums=0)(params, xb),
        jax.grad(loss_ref, argnums=1)(params, xb),
    )
    (got_val, got_gp), got_gx = (
        jax.value_and_grad(loss_fused, argnums=0)(params, xb),
        jax.grad(loss_fused, argnums=1)(params, xb),
    )
    np.testing.assert_allclose(float(got_val), float(ref_val),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               atol=2e-4, rtol=2e-3)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat_g = jax.tree_util.tree_leaves_with_path(got_gp)
    assert len(flat_r) == len(flat_g)
    for (pr, gr), (pg, gg) in zip(flat_r, flat_g):
        scale = max(1e-3, float(jnp.abs(gr).max()))
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), atol=5e-4 * scale, rtol=3e-3,
            err_msg=jax.tree_util.keystr(pr),
        )


@pytest.mark.slow  # 17 s; kernel fwd+bwd stays default via
# test_layer_block_{forward,grads}_match_flax, and the model-level
# integration pattern is covered default by test_attn_block's sibling
def test_proteoscribe_layer_block_impl_matches_xla(rng):
    """Model-level: attn_impl='layer-block-interpret' — identical param
    tree, logits, and training gradients vs the XLA graph."""
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
    blk_model = ProteoScribe(cfg, attn_impl="layer-block-interpret")
    blk_params = blk_model.init(jax.random.key(0), x, t, z_c)
    assert jax.tree.structure(params) == jax.tree.structure(blk_params)

    ref = ref_model.apply(params, x, t, z_c)
    got = blk_model.apply(params, x, t, z_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=2e-4)

    cot = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))

    def loss(model, p):
        return jnp.sum(model.apply(p, x, t, z_c) * cot)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(params)
    g_blk = jax.grad(lambda p: loss(blk_model, p))(params)
    for (pr, gr), (pb, gb) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_blk),
    ):
        scale = max(1e-3, float(jnp.abs(gr).max()))
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gr), atol=1e-3 * scale, rtol=5e-3,
            err_msg=jax.tree_util.keystr(pr),
        )


def test_layer_block_rejects_ragged_window():
    """L % window != 0 with local heads would leave the tail windows'
    attention scratch uninitialized (silent NaN/garbage + poisoned weight
    grads) — must raise in every mode."""
    import pytest

    from biom3_tpu.ops.pallas.layer_block_tpu import transformer_layer_block

    d, L, F = 128, 192, 256
    z = lambda *s: jnp.zeros(s, jnp.float32)
    with pytest.raises(ValueError, match="L % window"):
        transformer_layer_block(
            z(1, L, d), z(d, d), z(d, d), z(d, d), z(d, d), z(d),
            z(d), z(d), z(d), z(d), z(d, F), z(F), z(F, d), z(d),
            local_heads=2, heads=4, window=128, interpret=True,
        )
