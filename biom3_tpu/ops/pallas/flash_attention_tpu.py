"""Pallas TPU kernel: flash attention with key-padding mask.

For the Stage-1 towers (ESM2 L=1024 D=64, BERT L=512 D=64) — full softmax
attention computed in online-softmax tiles so the (L, L) score matrix never
hits HBM.  Numerics match ``biom3_tpu.ops.attention.full_attention`` (f32
softmax; HIGHEST-precision MXU passes for f32 inputs).

Grid: (B, H, L/BLK_Q).  Each program streams KV tiles of BLK_K keys,
maintaining running max/sum/accumulator (the standard flash recurrence).
The padding mask arrives as an i32 (B, L) array (1 = PAD) and masks key
columns tile by tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref,
    *, scale: float, blk_k: int, precision,
):
    # q_ref: (1, 1, BLK_Q, D); k/v_ref: (1, 1, L, D); mask_ref: (1, 1, L)
    # QK^T runs in the INPUT dtype with f32 accumulation: bf16 inputs use
    # single-pass MXU matmuls (casting to f32 here would force the multi-
    # pass f32 emulation); f32 inputs keep HIGHEST via ``precision``.
    q = q_ref[0, 0]
    L = k_ref.shape[2]
    BLK_Q, D = q.shape
    num_kv = L // blk_k

    m0 = jnp.full((BLK_Q, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((BLK_Q, 1), jnp.float32)
    a0 = jnp.zeros((BLK_Q, D), jnp.float32)

    def body(i, carry):
        m, s, acc = carry
        k = k_ref[0, 0, pl.ds(i * blk_k, blk_k), :]
        v = v_ref[0, 0, pl.ds(i * blk_k, blk_k), :]
        pad = mask_ref[0, 0, pl.ds(i * blk_k, blk_k)]       # (blk_k,) i32
        dots = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                            # (BLK_Q, blk_k)
        dots = jnp.where(pad[None, :] != 0, NEG_INF, dots)
        m_new = jnp.maximum(m, jnp.max(dots, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(dots - m_new)
        s_new = s * corr + jnp.sum(e, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_new = acc * corr + av
        return m_new, s_new, acc_new

    m, s, acc = jax.lax.fori_loop(0, num_kv, body, (m0, s0, a0))
    o_ref[0, 0] = (acc / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    padding_mask: jax.Array | None = None,
    blk_q: int = 256,
    blk_k: int = 256,
) -> jax.Array:
    """q, k, v: (B, H, L, D); padding_mask: (B, L) bool/int, True=PAD."""
    B, H, L, D = q.shape
    blk_q = min(blk_q, L)
    blk_k = min(blk_k, L)
    if L % blk_q or L % blk_k:
        raise ValueError(f"L={L} must divide into blocks ({blk_q}, {blk_k})")
    scale = D ** -0.5
    if padding_mask is None:
        mask = jnp.zeros((B, L), jnp.int32)
    else:
        mask = padding_mask.astype(jnp.int32)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None

    return pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, blk_k=blk_k, precision=precision
        ),
        grid=(B, H, L // blk_q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, L, D), lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, L, D), lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # (B, 1, L) with a (1, 1, L) block: the trailing two block dims
            # equal the array dims — a (1, L) 2-D block violates Mosaic's
            # sublane-divisibility rule on real TPUs
            pl.BlockSpec(
                (1, 1, L), lambda b, h, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), v.dtype),
    )(q, k, v, mask[:, None, :])
