"""Pallas TPU kernels, validated in interpreter mode on CPU against the XLA
reference implementations (the kernels compile natively on TPU; interpret
mode checks the kernel math device-independently)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.attention import full_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla
from biom3_tpu.ops.pallas.flash_attention_tpu import flash_attention_pallas
from biom3_tpu.ops.pallas.local_attention_tpu import local_window_attention_pallas


def _qkv(rng, B=1, H=2, L=256, D=32):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        for _ in range(3)
    )


def test_local_attention_kernel_matches_xla(rng):
    q, k, v = _qkv(rng, L=256, D=32)
    ref = local_window_attention_xla(q, k, v, window=64)
    with pltpu.force_tpu_interpret_mode():
        out = local_window_attention_pallas(q, k, v, window=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_local_attention_kernel_single_window(rng):
    """nw == 1: both neighbors masked; must equal plain softmax attention."""
    q, k, v = _qkv(rng, L=64, D=32)
    ref = full_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = local_window_attention_pallas(q, k, v, window=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_kernel_masked(rng):
    q, k, v = _qkv(rng, B=2, H=2, L=128, D=64)
    mask = jnp.asarray(rng.random((2, 128)) < 0.25)
    ref = full_attention(q, k, v, padding_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_pallas(q, k, v, padding_mask=mask, blk_q=64, blk_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_kernel_unmasked(rng):
    q, k, v = _qkv(rng, B=1, H=3, L=256, D=64)
    ref = full_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_pallas(q, k, v, blk_q=128, blk_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow  # 8 s; kernel-level flash tests and the fused-tower
# integration (test_esm2_stack) stay default
def test_esm2_with_pallas_attention_matches_xla(rng):
    """Whole tower forward: attn_impl='pallas' must agree with 'xla'."""
    from biom3_tpu.config import ESM2Config
    from biom3_tpu.models.esm2 import ESM2

    cfg = ESM2Config(num_layers=2, embed_dim=64, attention_heads=1, vocab_size=33)
    tokens = np.concatenate(
        [np.zeros((2, 1), np.int32),
         rng.integers(4, 24, (2, 62)).astype(np.int32),
         np.full((2, 1), 2, np.int32)],
        axis=1,
    )
    model_x = ESM2(cfg, attn_impl="xla")
    params = model_x.init(jax.random.key(0), jnp.asarray(tokens))
    ref = model_x.apply(params, jnp.asarray(tokens))["hidden"]
    model_p = ESM2(cfg, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out = model_p.apply(params, jnp.asarray(tokens))["hidden"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_attention_kernel_bf16(rng):
    """bf16 inputs: the kernel dots in bf16 with f32 accumulation (the perf
    convention) — must track the XLA bf16 path within bf16 drift."""
    q, k, v = (t.astype(jnp.bfloat16) for t in _qkv(rng, B=2, H=2, L=128, D=64))
    mask = jnp.asarray(rng.random((2, 128)) < 0.25)
    ref = full_attention(q, k, v, padding_mask=mask)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_pallas(q, k, v, padding_mask=mask, blk_q=64, blk_k=64)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_mxu_rotary_bit_exact(rng):
    """The ±1-permutation-matmul rotate_half must be BIT-exact with the
    split/concat reference (each output lane is ±x_i plus exact-zero
    products) in both f32 and bf16."""
    from biom3_tpu.ops.rotary import (
        _rotate_half_mxu, apply_rotary, rotate_half, rotary_cos_sin,
    )

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            rng.standard_normal((2, 3, 32, 64)).astype(np.float32)
        ).astype(dtype)
        ref = rotate_half(x)
        out = _rotate_half_mxu(x)
        assert out.dtype == ref.dtype
        assert jnp.array_equal(out, ref), dtype
        cos, sin = rotary_cos_sin(32, 64, dtype=dtype)
        full = apply_rotary(x, cos, sin)
        assert jnp.array_equal(full, x * cos + ref * sin), dtype


@pytest.mark.slow  # 63 s; the bench runs this drift gate on-chip every round
def test_pencl_serving_graph_matches_reference(rng):
    """The composed TPU serving graph (single-pass flash + tanh-GELU +
    MXU rotary) must track the parity graph (XLA attention + erf) on the
    protein embedding — the CPU twin of bench.py's on-chip drift gate."""
    from biom3_tpu.config import ESM2Config, PenCLConfig
    from biom3_tpu.models.pencl import PenCL

    import dataclasses
    cfg = dataclasses.replace(
        PenCLConfig(),
        esm=ESM2Config(num_layers=2, embed_dim=64, attention_heads=2,
                       vocab_size=33),
        protein_embedding=64,
    )
    x_p = jnp.asarray(
        np.concatenate([
            np.zeros((2, 1), np.int32),
            rng.integers(4, 24, (2, 126)).astype(np.int32),
            np.full((2, 1), 2, np.int32),
        ], axis=1)
    )
    ref = PenCL(cfg, dtype=jnp.bfloat16)
    params = ref.init(jax.random.key(0), x_p[:, :8], x_p)
    z_ref = ref.apply(params, x_p, method=PenCL.encode_protein)
    fast = PenCL(cfg, dtype=jnp.bfloat16, attn_impl="pallas:64:128",
                 gelu="tanh")
    with pltpu.force_tpu_interpret_mode():
        z_fast = fast.apply(params, x_p, method=PenCL.encode_protein)
    zr = np.asarray(z_ref, np.float32)
    zf = np.asarray(z_fast, np.float32)
    cos = (zr * zf).sum(-1) / (
        np.linalg.norm(zr, axis=-1) * np.linalg.norm(zf, axis=-1))
    assert cos.min() > 0.999, cos
