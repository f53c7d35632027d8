"""Non-causal linear attention (O(L) in sequence length).

Reproduces the global-head attention of the reference's Stage-3 transformer
(pinned dep ``linear_attention_transformer==0.19.1``, instantiated at
``Stage3_source/cond_diff_transformer_layer.py:124-142``): softmax feature
maps on q (over feature dim) and k (over sequence dim), a d×d context matrix
``k^T v``, then ``q @ context`` — two small matmuls that XLA maps straight
onto the MXU; no Pallas kernel needed because the contraction is already a
single fused GEMM pair per head.

Precision policy: softmaxes always accumulate in f32.  With f32 inputs the
matmuls run at HIGHEST precision (bit-parity mode); with bf16 inputs they run
on the MXU in bf16 with f32 accumulation (the fast path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q, k, v: (..., L, D) → (..., L, D).

    Matches lucidrains' ``linear_attn`` (non-causal, no kv mask):
      q' = softmax(q, axis=-1) * D**-0.5
      k' = softmax(k, axis=-2)         # over sequence positions
      out = q' @ (k'^T @ v)
    """
    dim = q.shape[-1]
    dtype = v.dtype
    fast = dtype == jnp.bfloat16
    precision = None if fast else jax.lax.Precision.HIGHEST

    qf = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * (dim ** -0.5)
    kf = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
    if fast:
        qf, kf = qf.astype(dtype), kf.astype(dtype)
        vv = v
    else:
        vv = v.astype(jnp.float32)
    context = jnp.einsum(
        "...nd,...ne->...de", kf, vv,
        precision=precision, preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "...nd,...de->...ne", qf, context.astype(qf.dtype),
        precision=precision, preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)
