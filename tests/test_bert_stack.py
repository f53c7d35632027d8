"""Fused BERT tower kernel vs the Flax graph (interpret mode, CPU twin)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import BertConfig
from biom3_tpu.models.bert import BertEncoder
from biom3_tpu.ops.pallas.bert_stack_tpu import (
    bert_embed,
    bert_stack_arrays,
    fused_bert_cls,
)

CFG = BertConfig(num_layers=2, hidden_size=128, num_heads=2,
                 intermediate_size=256, vocab_size=120,
                 max_position_embeddings=64)


@pytest.fixture(scope="module")
def tower():
    model = BertEncoder(CFG)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.mark.parametrize("rows", [1, 2])
def test_fused_bert_cls_matches_flax_f32(tower, rng, rows):
    model, params = tower
    ids = rng.integers(0, 120, (2, 64)).astype(np.int32)
    ref = np.asarray(model.apply(params, jnp.asarray(ids))["hidden"])[:, 0, :]

    arrays = bert_stack_arrays(params["params"], CFG.num_layers, jnp.float32)
    x0 = bert_embed(params["params"], jnp.asarray(ids), dtype=jnp.float32)
    out = np.asarray(fused_bert_cls(
        x0, **arrays, heads=CFG.num_heads, rows=rows, ff_block_l=32,
        gelu="erf", interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_fused_bert_cls_bf16_drift(tower, rng):
    model, params = tower
    ids = rng.integers(0, 120, (4, 64)).astype(np.int32)
    ref = np.asarray(model.apply(params, jnp.asarray(ids))["hidden"])[:, 0, :]
    arrays = bert_stack_arrays(params["params"], CFG.num_layers, jnp.bfloat16)
    x0 = bert_embed(params["params"], jnp.asarray(ids), dtype=jnp.bfloat16)
    out = np.asarray(fused_bert_cls(
        x0, **arrays, heads=CFG.num_heads, rows=2, ff_block_l=32,
        gelu="tanh", interpret=True,
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_fused_bert_cls_int8_ff_drift(tower, rng):
    """int8-FF serving mode (per-row dynamic activation quant x
    per-out-channel int8 weights, int32 MXU accumulation) tracks the f32
    graph to >=0.999 CLS cosine — same gate as the ESM2 twin."""
    model, params = tower
    ids = rng.integers(0, 120, (4, 64)).astype(np.int32)
    ref = np.asarray(model.apply(params, jnp.asarray(ids))["hidden"])[:, 0, :]
    arrays = bert_stack_arrays(params["params"], CFG.num_layers, jnp.bfloat16,
                               ff_quant="int8")
    assert arrays["w1"].dtype == jnp.int8
    x0 = bert_embed(params["params"], jnp.asarray(ids), dtype=jnp.bfloat16)
    out = np.asarray(fused_bert_cls(
        x0, **arrays, heads=CFG.num_heads, rows=2, ff_block_l=32,
        gelu="tanh", interpret=True, ff_quant="int8",
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_fused_bert_cls_vpu_opts_match_flax(tower, rng):
    """softmax_opt (scale·log2e folded into wq/bq, exp2 + reciprocal-mul)
    and ln_onepass (E[x²]−mean² LayerNorm) are exact-math rewrites: the
    f32 kernel with both on must match the Flax graph at f32 tolerances."""
    model, params = tower
    ids = rng.integers(0, 120, (2, 64)).astype(np.int32)
    ref = np.asarray(model.apply(params, jnp.asarray(ids))["hidden"])[:, 0, :]
    arrays = bert_stack_arrays(params["params"], CFG.num_layers, jnp.float32)
    x0 = bert_embed(params["params"], jnp.asarray(ids), dtype=jnp.float32)
    out = np.asarray(fused_bert_cls(
        x0, **arrays, heads=CFG.num_heads, rows=2, ff_block_l=32,
        gelu="erf", interpret=True, softmax_opt=True, ln_onepass=True,
    ))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=2e-3)


def test_fused_bert_cls_int8_proj_drift(tower, rng):
    """proj_quant='int8' (q/k/v/out on the int8 MXU path — note BERT is
    post-LN, so the quantized activation is the RAW residual): CLS cosine
    vs the f32 Flax graph must clear the serving gate."""
    model, params = tower
    ids = rng.integers(0, 120, (4, 64)).astype(np.int32)
    ref = np.asarray(model.apply(params, jnp.asarray(ids))["hidden"])[:, 0, :]
    arrays = bert_stack_arrays(
        params["params"], CFG.num_layers, jnp.bfloat16,
        ff_quant="int8", proj_quant="int8",
    )
    x0 = bert_embed(params["params"], jnp.asarray(ids))
    out = np.asarray(fused_bert_cls(
        x0, **arrays, heads=CFG.num_heads, rows=2, ff_block_l=32,
        gelu="tanh", interpret=True, ff_quant="int8", proj_quant="int8",
        softmax_opt=True, ln_onepass=True,
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos
