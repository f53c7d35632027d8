"""Ring attention vs full attention on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from biom3_tpu.ops.attention import full_attention
from biom3_tpu.ops.ring_attention import ring_attention


@pytest.fixture(scope="module")
def sp_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("tp",))


def _qkv(rng, B=2, H=2, L=256, D=32):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
        for _ in range(3)
    )


def test_ring_attention_matches_full(sp_mesh, rng):
    q, k, v = _qkv(rng)
    ref = full_attention(q, k, v)
    out = ring_attention(q, k, v, sp_mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_with_padding_mask(sp_mesh, rng):
    q, k, v = _qkv(rng, L=128)
    mask = jnp.asarray(rng.random((2, 128)) < 0.3)
    ref = full_attention(q, k, v, padding_mask=mask)
    out = ring_attention(q, k, v, sp_mesh, padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_long_context(sp_mesh, rng):
    """The point of SP: contexts beyond the reference's 1024 cap."""
    q, k, v = _qkv(rng, B=1, H=1, L=4096, D=16)
    ref = full_attention(q, k, v)
    out = ring_attention(q, k, v, sp_mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.slow  # 10 s; op-level ring tests (matches_full, long_context)
# stay default
def test_esm2_with_ring_attention_matches_xla(sp_mesh, rng):
    """Whole protein tower with sequence-parallel attention over 8 devices."""
    from biom3_tpu.config import ESM2Config
    from biom3_tpu.models.esm2 import ESM2

    cfg = ESM2Config(num_layers=2, embed_dim=64, attention_heads=2, vocab_size=33)
    tokens = np.concatenate(
        [np.zeros((2, 1), np.int32),
         rng.integers(4, 24, (2, 61)).astype(np.int32),
         np.full((2, 1), 2, np.int32),
         np.full((2, 1), 1, np.int32)],  # one pad
        axis=1,
    )
    model_x = ESM2(cfg, attn_impl="xla")
    params = model_x.init(jax.random.key(0), jnp.asarray(tokens))
    ref = model_x.apply(params, jnp.asarray(tokens))["hidden"]
    model_r = ESM2(cfg, attn_impl="ring", mesh=sp_mesh)
    out = model_r.apply(params, jnp.asarray(tokens))["hidden"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
