"""Linear / local attention parity vs the torch golden transcription."""

import numpy as np
import jax.numpy as jnp

from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla

import torch_golden


def _rand_qkv(rng, B=2, H=3, L=256, D=32):
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    v = rng.standard_normal((B, H, L, D)).astype(np.float32)
    return q, k, v


def test_linear_attention_matches_torch(rng):
    import torch

    q, k, v = _rand_qkv(rng)
    ref = torch_golden.linear_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    out = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_local_attention_matches_torch(rng):
    import torch

    q, k, v = _rand_qkv(rng, L=512, D=32)
    ref = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), window=128
    ).numpy()
    out = np.asarray(
        local_window_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=128
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_local_attention_window_edges(rng):
    """First window must ignore the (nonexistent) previous window, last the next."""
    import torch

    q, k, v = _rand_qkv(rng, B=1, H=1, L=512, D=16)
    ref = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), window=128
    ).numpy()
    out = np.asarray(
        local_window_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=128
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
    # window-0 queries (positions 0..127) attend only to keys 0..255;
    # perturbing keys from position 256 on must not change their output
    k2 = k.copy()
    k2[..., 256:, :] += 1.0
    out2 = np.asarray(
        local_window_attention_xla(
            jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v), window=128
        )
    )
    assert not np.allclose(out[..., 128:256, :], out2[..., 128:256, :])
    np.testing.assert_allclose(out[..., :128, :], out2[..., :128, :], atol=1e-5)
