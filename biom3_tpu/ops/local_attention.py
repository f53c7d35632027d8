"""Local (sliding-window, bucketed) attention.

Reproduces the local-head attention of the reference's Stage-3 transformer:
lucidrains ``local_attention`` as used by ``linear_attention_transformer``
(non-causal, window ``W``, look_backward=1, look_forward=1) — each window of
``W`` queries attends to the 3 surrounding key windows (prev/self/next), with
out-of-range windows masked.  Ref instantiation:
``Stage3_source/cond_diff_transformer_layer.py:124-142`` (W=128, 8 local heads).

This is the XLA implementation — windows map onto (128, 3·128) tiles which
XLA lays out well on the MXU.  A Pallas kernel with fused masking lives in
``biom3_tpu.ops.pallas.local_attention_tpu`` and is used on TPU via
``local_window_attention(..., impl="pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _band_mask(num_windows: int, window: int) -> jax.Array:
    """(num_windows, 3*window) bool mask; True = masked (out of range)."""
    w_idx = jnp.arange(num_windows)[:, None]            # query window
    k_win = w_idx + jnp.arange(3)[None, :] - 1          # (nw, 3) key-window ids
    invalid = (k_win < 0) | (k_win >= num_windows)      # (nw, 3)
    return jnp.repeat(invalid, window, axis=-1)         # (nw, 3*window)


def _look_around(x: jax.Array) -> jax.Array:
    """(..., nw, W, D) → (..., nw, 3W, D): [prev, self, next] window concat."""
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (0, 0), (0, 0)]
    padded = jnp.pad(x, pad)
    nw = x.shape[-3]
    prev = padded[..., 0:nw, :, :]
    cur = padded[..., 1 : nw + 1, :, :]
    nxt = padded[..., 2 : nw + 2, :, :]
    return jnp.concatenate([prev, cur, nxt], axis=-2)


def local_window_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int,
) -> jax.Array:
    """q, k, v: (..., L, D) with L % window == 0 → (..., L, D).

    Softmax always in f32; matmuls at HIGHEST precision for f32 inputs
    (parity mode) or native bf16 with f32 accumulation (fast mode).
    """
    *lead, L, D = q.shape
    if L % window != 0:
        raise ValueError(f"sequence length {L} not divisible by window {window}")
    nw = L // window
    dtype = v.dtype
    fast = dtype == jnp.bfloat16
    precision = None if fast else jax.lax.Precision.HIGHEST
    mm_dtype = dtype if fast else jnp.float32

    def bucket(x):
        return x.reshape(*lead, nw, window, D).astype(mm_dtype)

    bq = bucket(q)
    bk = _look_around(bucket(k))
    bv = _look_around(bucket(v))

    scale = D ** -0.5
    dots = jnp.einsum(
        "...ie,...je->...ij", bq, bk,
        precision=precision, preferred_element_type=jnp.float32,
    ) * scale
    mask = _band_mask(nw, window)                             # (nw, 3W)
    dots = jnp.where(mask[:, None, :], NEG_INF, dots)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum(
        "...ij,...je->...ie", attn.astype(mm_dtype), bv,
        precision=precision, preferred_element_type=jnp.float32,
    )
    return out.reshape(*lead, L, D).astype(dtype)


@functools.partial(jax.jit, static_argnames=("window", "impl"))
def local_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window: int = 128,
    impl: str = "xla",
) -> jax.Array:
    """Dispatching wrapper; ``impl`` ∈ {"xla", "pallas"}."""
    if impl == "pallas":
        from biom3_tpu.ops.pallas.local_attention_tpu import (
            local_window_attention_pallas,
        )

        return local_window_attention_pallas(q, k, v, window=window)
    return local_window_attention_xla(q, k, v, window=window)
