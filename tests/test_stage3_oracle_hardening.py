"""Adversarial hardening of the Stage-3 attention oracle (VERDICT r1 task 2).

``tests/torch_golden.py`` is a self-authored transcription of the pinned
``linear_attention_transformer==0.19.1`` semantics, so the golden-parity
tests share one author with the implementation under test.  These tests
break that circularity by checking BOTH sides against *independent* ground
truths that require no transcription at all:

  * local window attention (look_backward=1, look_forward=1, non-causal,
    pad-slot masking via the bucket ticker) is, by definition, dense full
    attention restricted to the band |i//W - j//W| <= 1 — implemented here
    as a 10-line numpy masked softmax written from that definition;
  * constant-value invariants that any correct softmax attention must
    satisfy exactly (weights sum to one), which catch axis mixups in the
    two softmax feature maps of linear attention;
  * boundary shapes (W==L single window, W=1 band, first/last window mask
    rows) and head-split extremes (local_heads ∈ {0, heads});
  * a deliberate head-order permutation showing the parity tests are
    *sensitive* to the local-heads-first convention (a silent reorder
    would be caught, not absorbed).

Ref semantics under test: lucidrains local/linear attention as
instantiated at Stage3_source/cond_diff_transformer_layer.py:124-142.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import torch_golden
from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla


def dense_banded_attention(q, k, v, window):
    """Independent numpy ground truth: full softmax attention masked to the
    window band |i//W - j//W| <= 1 (the definition of ±1 look-around)."""
    B, H, L, D = q.shape
    dots = np.einsum("bhid,bhjd->bhij", q, k).astype(np.float64) * (D ** -0.5)
    wi = np.arange(L) // window
    band = np.abs(wi[:, None] - wi[None, :]) <= 1
    dots = np.where(band[None, None], dots, -np.inf)
    dots -= dots.max(axis=-1, keepdims=True)
    e = np.exp(dots)
    attn = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", attn, v.astype(np.float64))


def _qkv(rng, B, H, L, D):
    return tuple(
        rng.standard_normal((B, H, L, D)).astype(np.float32) for _ in range(3)
    )


@pytest.mark.parametrize(
    "L,window",
    [
        (128, 128),  # single window: must equal unmasked full attention
        (256, 128),  # two windows: both are edge windows
        (512, 128),  # interior + first/last edge rows
        (4, 1),      # W=1 extreme: tridiagonal band
        (6, 2),      # tiny odd-ish shape
        (96, 32),
    ],
)
def test_local_attention_equals_dense_band(L, window, rng):
    """Over-determination: BOTH the torch golden transcription and the JAX
    op must equal the definitional dense banded attention."""
    import torch

    q, k, v = _qkv(rng, B=2, H=2, L=L, D=8)
    truth = dense_banded_attention(q, k, v, window)

    golden = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        window=window,
    ).numpy()
    np.testing.assert_allclose(golden, truth, atol=1e-5, rtol=1e-4)

    ours = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=window
    ))
    np.testing.assert_allclose(ours, truth, atol=1e-5, rtol=1e-4)


def test_local_attention_single_window_equals_full(rng):
    """L == W: the band covers everything — plain softmax(QK^T)V."""
    q, k, v = _qkv(rng, B=1, H=3, L=64, D=16)
    dots = np.einsum("bhid,bhjd->bhij", q, k) * (16 ** -0.5)
    e = np.exp(dots - dots.max(-1, keepdims=True))
    full = np.einsum("bhij,bhjd->bhid", e / e.sum(-1, keepdims=True), v)
    ours = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=64
    ))
    np.testing.assert_allclose(ours, full, atol=1e-5, rtol=1e-4)


def test_pad_slots_carry_zero_weight(rng):
    """look_around pad semantics: the first window's 'prev' slots and the
    last window's 'next' slots must contribute NOTHING — poisoning v at
    positions outside the band of an edge window cannot change its rows."""
    import torch

    W, L = 32, 96
    q, k, v = _qkv(rng, B=1, H=1, L=L, D=8)
    base_g = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), window=W
    ).numpy()
    base_j = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=W
    ))
    # poison everything the FIRST window cannot see (positions >= 2W)
    v_bad = v.copy(); v_bad[..., 2 * W:, :] = 1e6
    k_bad = k.copy(); k_bad[..., 2 * W:, :] = 37.0
    pois_g = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k_bad),
        torch.from_numpy(v_bad), window=W,
    ).numpy()
    pois_j = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k_bad), jnp.asarray(v_bad), window=W
    ))
    np.testing.assert_allclose(pois_g[..., :W, :], base_g[..., :W, :], atol=1e-5)
    np.testing.assert_allclose(pois_j[..., :W, :], base_j[..., :W, :], atol=1e-5)
    # and symmetrically for the LAST window (positions < L - 2W invisible)
    v_bad = v.copy(); v_bad[..., : L - 2 * W, :] = -1e6
    pois_j2 = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v_bad), window=W
    ))
    np.testing.assert_allclose(
        pois_j2[..., L - W:, :], base_j[..., L - W:, :], atol=1e-5
    )


def test_constant_value_invariants(rng):
    """Softmax weights sum to 1, so with v constant over positions:
      * local attention returns exactly that constant;
      * linear attention returns D**-0.5 · constant (q' rows sum to
        D**-0.5, k' columns sum to 1 over positions).
    An axis mixup in either softmax breaks these equalities."""
    B, H, L, D = 2, 2, 64, 16
    q = rng.standard_normal((B, H, L, D)).astype(np.float32)
    k = rng.standard_normal((B, H, L, D)).astype(np.float32)
    c = rng.standard_normal((1, 1, 1, D)).astype(np.float32)
    v = np.broadcast_to(c, (B, H, L, D)).copy()

    out_local = np.asarray(local_window_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), window=16
    ))
    np.testing.assert_allclose(
        out_local, np.broadcast_to(c, out_local.shape), atol=1e-5
    )

    out_linear = np.asarray(linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    ))
    np.testing.assert_allclose(
        out_linear, np.broadcast_to(c * D ** -0.5, out_linear.shape), atol=1e-5
    )
    # the golden transcription must satisfy the same invariants
    import torch

    g_local = torch_golden.local_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), window=16
    ).numpy()
    np.testing.assert_allclose(g_local, np.broadcast_to(c, g_local.shape), atol=1e-5)
    g_linear = torch_golden.linear_attn(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(
        g_linear, np.broadcast_to(c * D ** -0.5, g_linear.shape), atol=1e-5
    )


def test_linear_attention_position_mix_is_global(rng):
    """Every position's output depends on every key position (non-causal,
    O(L) global attention) — perturbing ONE key/value row moves all rows."""
    q, k, v = _qkv(rng, B=1, H=1, L=32, D=8)
    base = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    v2 = v.copy(); v2[..., 17, :] += 10.0
    out = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v2)))
    assert (np.abs(out - base) > 1e-7).all(), "some rows unaffected: not global"


def _attn_pair(dim, heads, local_heads, window, seed=0):
    """Matched (torch SelfAttention, jax SplitHeadAttention) with identical
    converted weights."""
    import torch

    from biom3_tpu.models.proteoscribe import SplitHeadAttention

    torch.manual_seed(seed)
    tm = torch_golden.SelfAttention(dim, heads, local_heads, window)
    cfg = ProteoScribeConfig(
        num_classes=29, dim=dim, depth=1, n_blocks=1, heads=heads,
        local_heads=local_heads, local_window=window, max_seq_len=window * 4,
        num_timesteps=64, cond_dim=8,
    )
    params = {"params": {
        "to_q_kernel": tm.to_q.weight.detach().numpy().T,
        "to_k_kernel": tm.to_k.weight.detach().numpy().T,
        "to_v_kernel": tm.to_v.weight.detach().numpy().T,
        "to_out": {
            "kernel": tm.to_out.weight.detach().numpy().T,
            "bias": tm.to_out.bias.detach().numpy(),
        },
    }}
    return tm, SplitHeadAttention(cfg), params


@pytest.mark.parametrize("local_heads", [0, 2, 4])
def test_split_extremes_match_golden(local_heads, rng):
    """local_heads ∈ {0, some, all}: all-linear, mixed, all-local."""
    import torch

    dim, heads, window = 32, 4, 16
    tm, jm, params = _attn_pair(dim, heads, local_heads, window)
    x = rng.standard_normal((2, 64, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(jm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_head_order_sensitivity(rng):
    """The parity test above is only meaningful if it would CATCH a
    reversed head split — verify linear-heads-first differs numerically."""
    import torch

    dim, heads, window = 32, 4, 16
    tm, jm, params = _attn_pair(dim, heads, 2, window, seed=1)
    x = rng.standard_normal((1, 64, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    # adversarial variant: permute head groups (linear heads first) by
    # swapping the two 2-head groups in every projection + out kernel
    def swap_heads(kernel):
        k2 = kernel.reshape(dim, heads, dim // heads)
        return np.concatenate([k2[:, 2:], k2[:, :2]], axis=1).reshape(dim, dim)

    bad = {"params": {
        "to_q_kernel": swap_heads(params["params"]["to_q_kernel"]),
        "to_k_kernel": swap_heads(params["params"]["to_k_kernel"]),
        "to_v_kernel": swap_heads(params["params"]["to_v_kernel"]),
        "to_out": params["params"]["to_out"],
    }}
    out_bad = np.asarray(jm.apply(bad, jnp.asarray(x)))
    assert np.abs(out_bad - ref).max() > 1e-3, (
        "head-order permutation is invisible — parity tests cannot catch "
        "a reversed split"
    )


def test_shape_guards():
    with pytest.raises(ValueError, match="not divisible by window"):
        local_window_attention_xla(
            jnp.zeros((1, 1, 100, 8)), jnp.zeros((1, 1, 100, 8)),
            jnp.zeros((1, 1, 100, 8)), window=64,
        )
    with pytest.raises(ValueError, match="not divisible by heads"):
        ProteoScribeConfig(dim=30, heads=4)
    with pytest.raises(ValueError, match="local_heads"):
        ProteoScribeConfig(heads=4, local_heads=5)
    with pytest.raises(ValueError, match="local_window"):
        ProteoScribeConfig(max_seq_len=100, local_window=64)
