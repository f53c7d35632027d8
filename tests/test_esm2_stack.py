"""Fused ESM2 tower kernel vs the Flax graph (interpret mode, CPU twin).

The serving kernel (ops/pallas/esm2_stack_tpu.py) must reproduce
``models/esm2.ESM2``'s post-final-norm CLS exactly in f32: same pre-LN,
fused-qkv, rotary, Q3 padding mask, token-dropout rescale, FF math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import ESM2Config
from biom3_tpu.models.esm2 import ESM2
from biom3_tpu.ops.pallas.esm2_stack_tpu import esm2_stack_arrays, fused_esm2_cls

CFG = ESM2Config(num_layers=2, embed_dim=256, attention_heads=4, vocab_size=33)


@pytest.fixture(scope="module")
def tower():
    model = ESM2(CFG)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32), compute_logits=False
    )
    return model, params


def _tokens(rng, B=2, L=128):
    toks = np.concatenate(
        [
            np.zeros((B, 1), np.int32),                       # <cls>
            rng.integers(4, 24, (B, L - 8)).astype(np.int32),  # residues
            np.full((B, 1), 2, np.int32),                      # <eos>
            np.full((B, 6), 1, np.int32),                      # <pad> ×6
        ],
        axis=1,
    )
    toks[0, 5] = 32  # one <mask> token exercises the token-dropout rescale
    return toks


@pytest.mark.parametrize("rows", [1, 2])
def test_fused_esm2_cls_matches_flax_f32(tower, rng, rows):
    model, params = tower
    toks = _tokens(rng)
    ref = np.asarray(
        model.apply(params, jnp.asarray(toks))["hidden"]
    )[:, 0, :]

    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.float32
    )
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads, rows=rows,
        ff_block_l=64, gelu="erf", interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_fused_esm2_cls_bf16_drift(tower, rng):
    """bf16 serving path tracks the f32 graph to >=0.999 CLS cosine (the
    bench drift gate's CPU twin)."""
    model, params = tower
    toks = _tokens(rng, B=4)
    ref = np.asarray(model.apply(params, jnp.asarray(toks))["hidden"])[:, 0, :]
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.bfloat16
    )
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads,
        ff_block_l=64, gelu="tanh", interpret=True,
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_quantize_weight_int8_roundtrip(rng):
    from biom3_tpu.ops.pallas.esm2_stack_tpu import quantize_weight_int8

    w = jnp.asarray(rng.standard_normal((3, 64, 96)).astype(np.float32) * 0.02)
    q, s = quantize_weight_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (3, 96)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None, :]
    # per-out-channel symmetric: max relative error bounded by half a step
    err = np.abs(deq - np.asarray(w)).max(axis=1)
    step = np.asarray(s)
    assert (err <= 0.5 * step + 1e-9).all()


def test_fused_esm2_cls_int8_ff_drift(tower, rng):
    """int8-FF serving path (per-row dynamic activation quant x per-channel
    weight quant, int32 MXU accumulation) tracks the f32 graph to >=0.999
    CLS cosine — the same gate the bench applies on-chip."""
    model, params = tower
    toks = _tokens(rng, B=4)
    ref = np.asarray(model.apply(params, jnp.asarray(toks))["hidden"])[:, 0, :]
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.bfloat16, ff_quant="int8"
    )
    assert arrays["w1"].dtype == jnp.int8
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads,
        ff_block_l=64, gelu="tanh", interpret=True, ff_quant="int8",
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_fused_esm2_cls_int8_full_drift(tower, rng):
    """int8 FF + int8 qkv/out projections: the all-linear-layers-quantized
    serving candidate must still clear the 0.999 CLS cosine gate."""
    model, params = tower
    toks = _tokens(rng, B=4)
    ref = np.asarray(model.apply(params, jnp.asarray(toks))["hidden"])[:, 0, :]
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.bfloat16,
        ff_quant="int8", proj_quant="int8",
    )
    assert arrays["wq"].dtype == jnp.int8
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads,
        ff_block_l=64, gelu="tanh", interpret=True,
        ff_quant="int8", proj_quant="int8",
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos


def test_fused_esm2_pad_invariance(tower, rng):
    """Q3: PAD keys are masked inside the kernel — the CLS embedding of a
    sequence must not change when the pad tail grows (any leaked pad key
    would add probability mass and shift the output).  Also sanity-check
    that real content DOES matter."""
    model, params = tower
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.float32
    )

    def run(t):
        return np.asarray(fused_esm2_cls(
            jnp.asarray(t), **arrays, heads=CFG.attention_heads,
            ff_block_l=8, gelu="erf", interpret=True,
        ))

    B, core = 2, 58  # <cls> + 56 residues + <eos>
    body = np.concatenate(
        [np.zeros((B, 1), np.int32),
         rng.integers(4, 24, (B, core - 2)).astype(np.int32),
         np.full((B, 1), 2, np.int32)], axis=1,
    )
    pad = lambda L: np.concatenate(
        [body, np.full((B, L - core), 1, np.int32)], axis=1
    )
    short = run(pad(64))   # 6 pad keys
    long = run(pad(128))   # 70 pad keys
    np.testing.assert_allclose(long, short, atol=1e-5, rtol=1e-5)

    flipped = pad(64)
    flipped[:, 3] = (flipped[:, 3] % 20) + 4
    assert np.abs(run(flipped) - short).max() > 1e-6  # content matters


def test_quant_helpers_zero_robustness():
    """All-zero weights/activations must quantize without NaN/inf (the
    1e-12 / 1e-6 scale floors)."""
    from biom3_tpu.ops.pallas.quant import (
        quant_cols,
        quant_rows,
        quantize_weight_int8,
    )

    q, s = quantize_weight_int8(jnp.zeros((2, 8, 16)))
    assert np.isfinite(np.asarray(s)).all() and not np.asarray(q).any()
    for fn, shape in ((quant_rows, (4, 8)), (quant_cols, (8, 4))):
        qa, a = fn(jnp.zeros(shape))
        assert np.isfinite(np.asarray(a)).all() and not np.asarray(qa).any()


def test_quant_scales_are_f32_for_bf16_inputs():
    """bf16 activations must get f32 scales (a bf16 amax would round the
    quant multiplier and dequant scale independently, non-cancelling)."""
    from biom3_tpu.ops.pallas.quant import quant_cols, quant_rows

    z = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 16)), jnp.bfloat16
    )
    for fn in (quant_rows, quant_cols):
        q, a = fn(z)
        assert q.dtype == jnp.int8
        assert a.dtype == jnp.float32, fn.__name__
        # round-trip stays within int8 resolution of the f32 value
        err = np.abs(
            np.asarray(q, np.float32)
            * np.asarray(a)
            - np.asarray(z, np.float32)
        ).max()
        assert err <= float(np.abs(np.asarray(z, np.float32)).max()) / 127


def test_fused_esm2_cls_vpu_opts_match_flax(tower, rng):
    """softmax_opt (scale·log2e folded into wq/bq, exp2 + reciprocal-mul —
    the fold rides through rotary, which is linear in q) and ln_onepass
    (E[x²]−mean² LayerNorm) are exact-math rewrites: the f32 kernel with
    both on must still match the Flax graph at f32 tolerances."""
    model, params = tower
    toks = _tokens(rng)
    ref = np.asarray(
        model.apply(params, jnp.asarray(toks))["hidden"]
    )[:, 0, :]
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.float32
    )
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads,
        ff_block_l=64, gelu="erf", interpret=True,
        softmax_opt=True, ln_onepass=True,
    ))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=2e-3)


def test_fused_esm2_cls_vpu_opts_int8_drift(tower, rng):
    """softmax_opt on the int8 projection path folds into the f32 sq
    dequant scales + bq — drift must stay within the serving gate."""
    model, params = tower
    toks = _tokens(rng, B=4)
    ref = np.asarray(model.apply(params, jnp.asarray(toks))["hidden"])[:, 0, :]
    arrays = esm2_stack_arrays(
        params["params"], CFG.num_layers, dtype=jnp.bfloat16,
        ff_quant="int8", proj_quant="int8",
    )
    out = np.asarray(fused_esm2_cls(
        jnp.asarray(toks), **arrays, heads=CFG.attention_heads,
        ff_block_l=64, gelu="tanh", interpret=True,
        ff_quant="int8", proj_quant="int8",
        softmax_opt=True, ln_onepass=True,
    ))
    cos = np.sum(out * ref, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999, cos
