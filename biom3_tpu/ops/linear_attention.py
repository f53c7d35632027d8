"""Non-causal linear attention (O(L) in sequence length).

Reproduces the global-head attention of the reference's Stage-3 transformer
(pinned dep ``linear_attention_transformer==0.19.1``, instantiated at
``Stage3_source/cond_diff_transformer_layer.py:124-142``): softmax feature
maps on q (over feature dim) and k (over sequence dim), a d×d context matrix
``k^T v``, then ``q @ context`` — two small matmuls that XLA maps straight
onto the MXU; no Pallas kernel needed because the contraction is already a
single fused GEMM pair per head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """q, k, v: (..., L, D) → (..., L, D).

    Matches lucidrains' ``linear_attn`` (non-causal, no kv mask):
      q' = softmax(q, axis=-1) * D**-0.5
      k' = softmax(k, axis=-2)         # over sequence positions
      out = q' @ (k'^T @ v)
    """
    dim = q.shape[-1]
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1) * (dim ** -0.5)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
    v32 = v.astype(jnp.float32)
    context = jnp.einsum("...nd,...ne->...de", k, v32, precision=precision)
    out = jnp.einsum("...nd,...de->...ne", q, context, precision=precision)
    return out.astype(v.dtype)
