"""Full softmax attention with optional padding mask and f32 accumulation.

Used by the Stage-1 towers (ESM2 / BERT); on TPU the flash-attention Pallas
kernel in ``biom3_tpu.ops.pallas.flash_attention_tpu`` replaces this for long
sequences, with identical numerics up to f32 accumulation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    padding_mask: jax.Array | None = None,
    scale: float | None = None,
    precision=None,
    impl: str = "xla",
    mesh=None,
) -> jax.Array:
    """q, k, v: (..., H, L, D); padding_mask: (..., L) True at PAD positions.

    Softmax is computed in float32 (both fair-esm and HF BERT upcast the
    softmax; ref: Stage1_source/model.py towers are fp32 on the demo path).
    ``impl="pallas"`` dispatches to the flash-attention TPU kernel;
    ``impl="ring"`` to sequence-parallel ring attention over ``mesh``.

    ``precision=None`` resolves by dtype (the repo-wide convention):
    HIGHEST for the f32 parity path, hardware-default for bf16 — the MXU
    accumulates bf16 matmuls in f32 natively, and forcing HIGHEST on bf16
    inputs triggers the ~6-pass f32-emulation (measured 6x attention cost
    in the Stage-1 towers).
    """
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
        )
    if impl == "pallas" or impl.startswith("pallas:"):
        from biom3_tpu.ops.pallas.flash_attention_tpu import (
            flash_attention_pallas,
        )

        kw = {}
        if ":" in impl:  # "pallas:BLKQ:BLKK" — block-size override for A/Bs
            _, bq, bk = impl.split(":")
            kw = {"blk_q": int(bq), "blk_k": int(bk)}
        return flash_attention_pallas(q, k, v, padding_mask=padding_mask, **kw)
    if impl == "ring":
        from biom3_tpu.ops.ring_attention import ring_attention

        if mesh is None:
            raise ValueError("impl='ring' needs a mesh")
        axis = "tp" if "tp" in mesh.shape else list(mesh.shape)[-1]
        return ring_attention(q, k, v, mesh, axis=axis, padding_mask=padding_mask)
    D = q.shape[-1]
    scale = D ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "...id,...jd->...ij", q, k, precision=precision,
        preferred_element_type=jnp.float32,  # f32 accumulation off the MXU
    )
    logits = logits * scale
    if padding_mask is not None:
        # broadcast over heads and query positions: mask key positions
        logits = jnp.where(
            padding_mask[..., None, None, :], NEG_INF, logits
        )
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...ij,...jd->...id", attn, v, precision=precision)
