"""Pallas TPU kernel: local (3-window band) attention.

Semantics identical to ``local_window_attention_xla`` (lucidrains local
attention, non-causal, look_backward=1, look_forward=1): each window of W
queries attends to [prev, self, next] key windows with out-of-range windows
masked.

Kernel design: K and V are pre-padded by one window on both ends so the
three neighbor windows of query-window ``w`` sit at non-overlapping block
offsets (w, w+1, w+2) — three (W, D) tiles per operand, expressed as three
``BlockSpec``s (Pallas block index maps can't express overlapping windows).
The kernel computes three (W, W) MXU products, a joint f32 softmax with
edge masking from ``program_id``, and accumulates the three AV products —
no (L, 3W) key materialization in HBM, one fused pass in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(
    q_ref, kp_ref, kc_ref, kn_ref, vp_ref, vc_ref, vn_ref, o_ref,
    *, scale: float, num_windows: int, precision,
):
    w = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale            # (W, D)

    def dots(k_ref):
        return jax.lax.dot_general(
            q, k_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                # (W, W)

    d_prev, d_cur, d_next = dots(kp_ref), dots(kc_ref), dots(kn_ref)
    d_prev = jnp.where(w == 0, NEG_INF, d_prev)
    d_next = jnp.where(w == num_windows - 1, NEG_INF, d_next)

    m = jnp.maximum(
        jnp.max(d_prev, axis=-1), jnp.maximum(
            jnp.max(d_cur, axis=-1), jnp.max(d_next, axis=-1))
    )[:, None]
    e_prev = jnp.exp(d_prev - m)
    e_cur = jnp.exp(d_cur - m)
    e_next = jnp.exp(d_next - m)
    denom = (
        jnp.sum(e_prev, axis=-1) + jnp.sum(e_cur, axis=-1)
        + jnp.sum(e_next, axis=-1)
    )[:, None]

    def av(e, v_ref):
        return jax.lax.dot_general(
            e.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    out = (av(e_prev, vp_ref) + av(e_cur, vc_ref) + av(e_next, vn_ref)) / denom
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window",))
def local_window_attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, *, window: int = 128
) -> jax.Array:
    """q, k, v: (B, H, L, D), L % window == 0 → (B, H, L, D)."""
    B, H, L, D = q.shape
    if L % window != 0:
        raise ValueError(f"L={L} not divisible by window={window}")
    nw = L // window
    BH = B * H
    scale = D ** -0.5

    qf = q.reshape(BH, L, D)
    # pad K/V by one window on both ends → neighbor windows at block offsets
    kf = jnp.pad(k.reshape(BH, L, D), ((0, 0), (window, window), (0, 0)))
    vf = jnp.pad(v.reshape(BH, L, D), ((0, 0), (window, window), (0, 0)))

    block = (1, window, D)
    q_spec = pl.BlockSpec(block, lambda b, w: (b, w, 0), memory_space=pltpu.VMEM)

    def shifted(offset):
        return pl.BlockSpec(
            block, lambda b, w, o=offset: (b, w + o, 0), memory_space=pltpu.VMEM
        )

    # f32 inputs → full-precision MXU passes (parity); bf16 → fast path
    precision = (
        jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, num_windows=nw, precision=precision
        ),
        grid=(BH, nw),
        in_specs=[
            q_spec,
            shifted(0), shifted(1), shifted(2),   # k prev/cur/next
            shifted(0), shifted(1), shifted(2),   # v prev/cur/next
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BH, L, D), v.dtype),
    )(qf, kf, kf, kf, vf, vf, vf)
    return out.reshape(B, H, L, D)
