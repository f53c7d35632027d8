"""Train-mode dropout: stochastic under different rngs, exact no-op in eval.

VERDICT r1 #4: the reference trains through Lightning train mode, so dropout
fires in the projection heads (stage1_config.json:46 = 0.1) and the BERT
tower; Stage-3's knobs map from ``input_dp_rate``
(cond_diff_transformer_layer.py:234-237) — NOT the dead ``transformer_dropout``
config key (get_model never reads it).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import (
    BertConfig,
    Config,
    ESM2Config,
    PenCLConfig,
    ProteoScribeConfig,
)
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.stage1_task import stage1_loss_fn

TINY_PENCL = PenCLConfig(
    esm=ESM2Config(num_layers=1, embed_dim=16, attention_heads=2, vocab_size=33),
    bert=BertConfig(num_layers=1, hidden_size=16, num_heads=2,
                    intermediate_size=32, vocab_size=40,
                    max_position_embeddings=16),
    protein_embedding=16, text_embedding=16, proj_dim=8, temperature=0.8,
)

SMALL_PS = ProteoScribeConfig(
    num_classes=29, dim=64, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=32, max_seq_len=64, num_timesteps=64, cond_dim=16,
    attn_layer_dropout=0.2, ff_dropout=0.2,
)


def _pencl_batch(rng, B=2):
    def toks(v, L):
        return jnp.asarray(rng.integers(4, v, (B, L)).astype(np.int32))

    batch = {"text_tokens": toks(40, 12), "protein_tokens": toks(30, 14)}
    for k in list(batch):
        masked = np.asarray(batch[k]).copy()
        masked[:, 2] = 32 if "protein" in k else 5
        batch[k + "_masked"] = jnp.asarray(masked)
    return batch


@pytest.mark.slow  # 45 s; stage-3 twin below covers the dropout rng plumbing
def test_stage1_dropout_stochastic_vs_eval_deterministic(rng):
    model = PenCL(TINY_PENCL)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    batch = _pencl_batch(rng)
    kw = dict(temperature=0.8, dataset_type="masked",
              text_mask_id=5, protein_mask_id=32)

    loss_fn = jax.jit(
        lambda p, b, k: stage1_loss_fn(
            model.apply, p, b, dropout_key=k, **kw)[0]
    )
    l1 = float(loss_fn(params, batch, jax.random.key(1)))
    l2 = float(loss_fn(params, batch, jax.random.key(2)))
    assert l1 != l2, "train-mode dropout must be stochastic across rngs"

    eval_fn = jax.jit(
        lambda p, b: stage1_loss_fn(model.apply, p, b, dropout_key=None, **kw)[0]
    )
    e1, e2 = float(eval_fn(params, batch)), float(eval_fn(params, batch))
    assert e1 == e2, "eval mode must be deterministic"
    assert e1 != l1


def test_stage3_dropout_stochastic_vs_eval_deterministic(rng):
    model = ProteoScribe(SMALL_PS)
    x = jnp.asarray(rng.integers(0, 29, (2, 64)).astype(np.int32))
    t = jnp.asarray([3, 10], jnp.int32)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x, t, z)

    fwd = jax.jit(
        lambda k: model.apply(
            params, x, t, z, deterministic=False, rngs={"dropout": k})
    )
    a = np.asarray(fwd(jax.random.key(1)))
    b = np.asarray(fwd(jax.random.key(2)))
    assert not np.allclose(a, b)

    det = jax.jit(lambda: model.apply(params, x, t, z))
    np.testing.assert_array_equal(np.asarray(det()), np.asarray(det()))


def test_stage3_scan_layers_dropout_runs(rng):
    """The nn.scan path must split the dropout rng per layer."""
    model = ProteoScribe(SMALL_PS, scan_layers=True)
    x = jnp.asarray(rng.integers(0, 29, (2, 64)).astype(np.int32))
    t = jnp.asarray([3, 10], jnp.int32)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x, t, z)
    out = model.apply(
        params, x, t, z, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    assert np.isfinite(np.asarray(out)).all()


def test_stage3_zero_rate_dropout_is_exact_noop(rng):
    """At the published config (input_dp_rate=0.0) train mode == eval mode."""
    cfg = dataclasses.replace(SMALL_PS, attn_layer_dropout=0.0, ff_dropout=0.0)
    model = ProteoScribe(cfg)
    x = jnp.asarray(rng.integers(0, 29, (2, 64)).astype(np.int32))
    t = jnp.asarray([3, 10], jnp.int32)
    z = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), x, t, z)
    train = model.apply(
        params, x, t, z, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    evald = model.apply(params, x, t, z)
    np.testing.assert_array_equal(np.asarray(train), np.asarray(evald))


def test_stage3_config_dropout_mapping_and_guards():
    cfg = Config({"input_dp_rate": 0.25, "diffusion_steps": 64,
              "transformer_local_size": 32})
    ps = ProteoScribeConfig.from_stage_config(cfg)
    assert ps.attn_layer_dropout == 0.25
    assert ps.ff_dropout == 0.0  # get_model hardcodes 0 (ref :235)

    # transformer_dropout is dead config in the reference — must NOT map
    cfg2 = Config({"transformer_dropout": 0.1, "diffusion_steps": 64,
               "transformer_local_size": 32})
    ps2 = ProteoScribeConfig.from_stage_config(cfg2)
    assert ps2.attn_layer_dropout == 0.0 and ps2.ff_dropout == 0.0

    with pytest.raises(ValueError, match="reversible"):
        ProteoScribeConfig.from_stage_config(
            Config({"transformer_reversible": True})
        )
