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
