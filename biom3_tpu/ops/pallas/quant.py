"""Shared int8 quantization helpers for the fused serving kernels.

Scheme (the standard weight-only + dynamic-activation GEMM recipe): weights
are per-out-channel symmetric int8 (``w ≈ q · s``, contracted axis kept full
precision in the scale); activations are quantized per token (per row — or
per column in the transposed d-major layouts) right before each matmul, the
dot accumulates in int32 on the MXU's int8 path (~2× the bf16 rate on
v5e/v6e), and the two rank-1 scale vectors fuse into a single f32 rescale of
the int32 accumulator.  Measured on-chip A/Bs live in
``tools/exp_esm2_stack.py`` / ``tools/exp_pallas_int8.py``; drift gates
(CLS/logit cosine vs the f32 graph) guard every serving default.

These helpers are plain jnp, usable both host-side (packing) and inside
Pallas kernel bodies (dynamic activation quant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jax.Array):
    """Per-out-channel symmetric int8: w ≈ q · s with s = amax_col/127.

    ``w`` is (depth, in, out); returns (q int8 same shape, s f32
    (depth, out)).  Contracted axis stays full precision in the scale —
    the standard weight-only GEMM quantization."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s[:, 0, :]


def quant_rows(z: jax.Array):
    """Dynamic per-row symmetric int8: z ≈ q · a with a = amax_row/127.

    For (tokens, features) activations ahead of a row-contracting matmul;
    returns (q int8, a f32 (rows, 1)).  amax is computed in f32 — bf16
    inputs would otherwise round BOTH the quant multiplier and the dequant
    scale independently (~2^-9 each, non-cancelling)."""
    zf = z.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(zf), axis=1, keepdims=True), 1e-6)
    q = jnp.clip(
        jnp.round(zf * (127.0 / amax)), -127.0, 127.0
    ).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def quant_cols(z: jax.Array):
    """Per-column twin of :func:`quant_rows` for transposed
    (features, tokens) activations; returns (q int8, a f32 (1, cols))."""
    zf = z.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(zf), axis=0, keepdims=True), 1e-6)
    q = jnp.clip(
        jnp.round(zf * (127.0 / amax)), -127.0, 127.0
    ).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)
