"""Training-path fused attention block with a custom VJP (Pallas TPU).

``exp_train_decomp`` measured the Stage-3 train step's attention block at
~14.5 ms/layer fwd+bwd (B=32): the windowed local-attention backward
materializes (B, H, nw, W, 3W) f32 score strips through HBM (~8.3 ms alone),
plus head split/merge relayouts and sub-peak projections.  This op runs the
COMPLETE attention sub-block — q/k/v projections, 8 local-window heads (±1
look-around, W=128), 8 linear-attention heads, output projection — as one
Pallas kernel per direction, with flash-style recompute in the backward:
scores/probabilities live only in VMEM, never in HBM, and the only residual
saved between passes is the input itself.

Math (both passes verified against the XLA composition in
tests/test_attn_block.py, values AND grads): lucidrains
``linear_attention_transformer==0.19.1`` semantics as instantiated at
``Stage3_source/cond_diff_transformer_layer.py:124-142`` — bias-free q/k/v,
local heads first, joint softmax over the 3-window band, linear attention
with feature/sequence softmaxes, biased out-projection.

Forward (per batch row, grid (B,)):
  xnᵀ (d, L) → qᵀ/kᵀ/vᵀ (head slices on the SUBLANE axis) → K/V staged into
  (d, L+2W) zero-padded scratch so every window reads a fixed 3W strip →
  window fori_loop (VMEM-resident softmax) + linear heads → attnᵀ (d, L) →
  out = attnᵀᵀ·Wo + bo.

Backward recomputes q/k/v and every softmax, then accumulates dWq/dWk/dWv/
dWo/dbo across the sequential grid (constant-index output blocks:
initialize at b == 0, add afterwards) and emits dxn per row.

Dropout after the projection (attn_layer_dropout > 0) stays outside in the
Flax module — at the published config it is 0.0 (stage3_config.json:54).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _band_mask_neg(w, W, L, nw):
    """(1, 3W) additive mask for window w: NEG_INF at key slots whose global
    position (w·W - W + j) falls outside [0, L)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * W), 1)
    gpos = j + w * W - W
    return jnp.where((gpos < 0) | (gpos >= L), NEG_INF, 0.0)


def _stage_qkv(xnt, w_ref, dst, qkv_ref, kpad_ref, vpad_ref, *, nl_rows, W,
               precision, cdtype):
    """Project xnt with the three kernels packed in w_ref ((3, d, d), layout
    (in, out)) into qkv scratch; local-head K/V rows additionally staged
    into the zero-padded strips."""
    d, L = xnt.shape
    zt = jax.lax.dot_general(
        w_ref[dst].astype(cdtype), xnt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                          # (d_out, L)
    qkv_ref[dst * d:(dst + 1) * d, :] = zt
    if nl_rows > 0 and dst == 1:
        kpad_ref[0:nl_rows, W:W + L] = zt[:nl_rows, :]
    if nl_rows > 0 and dst == 2:
        vpad_ref[0:nl_rows, W:W + L] = zt[:nl_rows, :]
    return zt


def _local_fwd(qkv_ref, kpad_ref, vpad_ref, attn_ref, *, nl, Dh, W, L,
               precision, cdtype, scale):
    nl_rows = nl * Dh
    nw = L // W

    def body(w, _):
        off = pl.multiple_of(w * W, W)
        qw = qkv_ref[0:nl_rows, pl.ds(off, W)].reshape(nl, Dh, W)
        kn = kpad_ref[0:nl_rows, pl.ds(off, 3 * W)].reshape(nl, Dh, 3 * W)
        vn = vpad_ref[0:nl_rows, pl.ds(off, 3 * W)].reshape(nl, Dh, 3 * W)
        dots = jax.lax.dot_general(
            qw, kn, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                             # (nl, W, 3W)
        dots = dots + _band_mask_neg(w, W, L, nw)
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
        avt = jax.lax.dot_general(
            vn, p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)                                      # (nl, Dh, W)
        attn_ref[0:nl_rows, pl.ds(off, W)] = avt.reshape(nl_rows, W)
        return _

    jax.lax.fori_loop(0, nw, body, None)


def _linear_fwd(qkv_ref, attn_ref, *, nl, ng, Dh, d, precision, cdtype,
                scale):
    """Linear-attention global heads; returns (qf, kf, ctx) f32/cdtype for
    reuse (backward recompute calls this too)."""
    L = attn_ref.shape[1]
    lo, hi = nl * Dh, d
    qtg = qkv_ref[lo:hi, :].reshape(ng, Dh, L).astype(jnp.float32)
    ktg = qkv_ref[d + lo:d + hi, :].reshape(ng, Dh, L).astype(jnp.float32)
    vtg = qkv_ref[2 * d + lo:2 * d + hi, :].reshape(ng, Dh, L)
    qf = (jax.nn.softmax(qtg, axis=1) * scale).astype(cdtype)
    kf = jax.nn.softmax(ktg, axis=2).astype(cdtype)
    ctx = jax.lax.dot_general(
        kf, vtg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                          # (ng, Dhk, Dhv)
    lin = jax.lax.dot_general(
        ctx, qf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                          # (ng, Dhv, L)
    attn_ref[lo:hi, :] = lin.reshape(ng * Dh, L)
    return qtg, ktg, vtg, qf, kf, ctx


def _attn_fwd_kernel(
    xn_ref, w3_ref, wo_ref, bo_ref,
    o_ref,
    qkv_ref, kpad_ref, vpad_ref, attn_ref,
    *, local_heads, heads, window, precision,
):
    cdtype = qkv_ref.dtype
    L, d = xn_ref.shape[1], xn_ref.shape[2]
    Dh = d // heads
    nl, ng = local_heads, heads - local_heads
    W = window
    scale = Dh ** -0.5

    if nl > 0:
        kpad_ref[0:nl * Dh, 0:W] = jnp.zeros((nl * Dh, W), cdtype)
        kpad_ref[0:nl * Dh, W + L:] = jnp.zeros((nl * Dh, W), cdtype)
        vpad_ref[0:nl * Dh, 0:W] = jnp.zeros((nl * Dh, W), cdtype)
        vpad_ref[0:nl * Dh, W + L:] = jnp.zeros((nl * Dh, W), cdtype)

    xnt = xn_ref[0].astype(cdtype).T                          # (d, L)
    for dst in range(3):
        _stage_qkv(xnt, w3_ref, dst, qkv_ref, kpad_ref, vpad_ref,
                   nl_rows=nl * Dh, W=W, precision=precision, cdtype=cdtype)

    if nl > 0:
        _local_fwd(qkv_ref, kpad_ref, vpad_ref, attn_ref, nl=nl, Dh=Dh,
                   W=W, L=L, precision=precision, cdtype=cdtype, scale=scale)
    if ng > 0:
        _linear_fwd(qkv_ref, attn_ref, nl=nl, ng=ng, Dh=Dh, d=d,
                    precision=precision, cdtype=cdtype, scale=scale)

    out = jax.lax.dot_general(
        attn_ref[:], wo_ref[:].astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bo_ref[0].astype(jnp.float32)                         # (L, d)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(
    xn_ref, w3_ref, wo_ref, do_ref,
    dxn_ref, dw3_ref, dwo_ref, dbo_ref,
    qkv_ref, kpad_ref, vpad_ref, attn_ref, dq_ref, dk_ref, dv_ref,
    dkpad_ref, dvpad_ref,
    *, local_heads, heads, window, precision,
):
    b = pl.program_id(0)
    cdtype = qkv_ref.dtype
    L, d = xn_ref.shape[1], xn_ref.shape[2]
    Dh = d // heads
    nl, ng = local_heads, heads - local_heads
    nl_rows = nl * Dh
    W = window
    nw = L // W
    scale = Dh ** -0.5

    # ---- recompute forward staging ----
    if nl > 0:
        kpad_ref[0:nl_rows, 0:W] = jnp.zeros((nl_rows, W), cdtype)
        kpad_ref[0:nl_rows, W + L:] = jnp.zeros((nl_rows, W), cdtype)
        vpad_ref[0:nl_rows, 0:W] = jnp.zeros((nl_rows, W), cdtype)
        vpad_ref[0:nl_rows, W + L:] = jnp.zeros((nl_rows, W), cdtype)
    xnt = xn_ref[0].astype(cdtype).T                          # (d, L)
    for dst in range(3):
        _stage_qkv(xnt, w3_ref, dst, qkv_ref, kpad_ref, vpad_ref,
                   nl_rows=nl_rows, W=W, precision=precision, cdtype=cdtype)
    if nl > 0:
        _local_fwd(qkv_ref, kpad_ref, vpad_ref, attn_ref, nl=nl, Dh=Dh,
                   W=W, L=L, precision=precision, cdtype=cdtype, scale=scale)
    if ng > 0:
        qtg, ktg, vtg, qf, kf, ctx = _linear_fwd(
            qkv_ref, attn_ref, nl=nl, ng=ng, Dh=Dh, d=d,
            precision=precision, cdtype=cdtype, scale=scale,
        )

    dout = do_ref[0].astype(jnp.float32)                      # (L, d)

    # ---- out projection grads ----
    # out = attnᵀᵀ Wo + bo  ⇒  dWo = attnᵀ·dout, dbo = Σ_L dout,
    # dattnᵀ = Wo·doutᵀ
    dwo_c = jax.lax.dot_general(
        attn_ref[:].astype(cdtype), dout.astype(cdtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                         # (d, d)
    dbo_c = jnp.sum(dout, axis=0, keepdims=True)              # (1, d)
    dattn = jax.lax.dot_general(
        wo_ref[:].astype(cdtype), dout.astype(cdtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                          # (d, L)

    # ---- local heads backward (window loop, VMEM-resident softmax) ----
    dq_ref[:] = jnp.zeros((d, L), jnp.float32)
    dkpad_ref[:] = jnp.zeros(dkpad_ref.shape, jnp.float32)
    dvpad_ref[:] = jnp.zeros(dvpad_ref.shape, jnp.float32)

    if nl > 0:
        # dattn rows for local heads, staged so the loop can slice a ref
        dv_ref[0:nl_rows, :] = dattn[0:nl_rows, :].astype(jnp.float32)

        def body(w, _):
            off = pl.multiple_of(w * W, W)
            qw = qkv_ref[0:nl_rows, pl.ds(off, W)].reshape(nl, Dh, W)
            kn = kpad_ref[0:nl_rows, pl.ds(off, 3 * W)].reshape(nl, Dh, 3 * W)
            vn = vpad_ref[0:nl_rows, pl.ds(off, 3 * W)].reshape(nl, Dh, 3 * W)
            dots = jax.lax.dot_general(
                qw, kn, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale
            dots = dots + _band_mask_neg(w, W, L, nw)
            m = jnp.max(dots, axis=-1, keepdims=True)
            e = jnp.exp(dots - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)        # (nl, W, 3W) f32
            pc = p.astype(cdtype)

            davt = (
                dv_ref[0:nl_rows, pl.ds(off, W)].astype(cdtype)
            ).reshape(nl, Dh, W)
            # dV strip: davt·p over W
            dvn = jax.lax.dot_general(
                davt, pc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                 # (nl, Dh, 3W)
            dvpad_ref[0:nl_rows, pl.ds(off, 3 * W)] = (
                dvpad_ref[0:nl_rows, pl.ds(off, 3 * W)]
                + dvn.reshape(nl_rows, 3 * W)
            )
            # dP = davtᵀ·vn over Dh
            dp = jax.lax.dot_general(
                davt, vn, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                 # (nl, W, 3W)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  * scale).astype(cdtype)
            dqw = jax.lax.dot_general(
                kn, ds, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                 # (nl, Dh, W)
            dq_ref[0:nl_rows, pl.ds(off, W)] = dqw.reshape(nl_rows, W)
            dkn = jax.lax.dot_general(
                qw, ds, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                 # (nl, Dh, 3W)
            dkpad_ref[0:nl_rows, pl.ds(off, 3 * W)] = (
                dkpad_ref[0:nl_rows, pl.ds(off, 3 * W)]
                + dkn.reshape(nl_rows, 3 * W)
            )
            return _

        jax.lax.fori_loop(0, nw, body, None)

    if nl > 0:
        dk_ref[0:nl_rows, :] = dkpad_ref[0:nl_rows, W:W + L]
        dv_ref[0:nl_rows, :] = dvpad_ref[0:nl_rows, W:W + L]

    # ---- linear heads backward ----
    if ng > 0:
        lo, hi = nl_rows, d
        dlin = dattn[lo:hi, :].reshape(ng, Dh, L).astype(cdtype)
        dctx = jax.lax.dot_general(
            qf, dlin, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)                                      # (ng, Dhk, Dhv)
        dqf = jax.lax.dot_general(
            ctx, dlin, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                     # (ng, Dhk, L)
        dkf = jax.lax.dot_general(
            dctx, vtg.astype(cdtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                     # (ng, Dhk, L)
        dvt_g = jax.lax.dot_general(
            dctx, kf, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                     # (ng, Dhv, L)
        # qf = softmax(qtg, axis=1)·scale
        smq = jax.nn.softmax(qtg, axis=1)
        dsq = dqf * scale
        dqtg = smq * (dsq - jnp.sum(dsq * smq, axis=1, keepdims=True))
        # kf = softmax(ktg, axis=2)
        smk = jax.nn.softmax(ktg, axis=2)
        dktg = smk * (dkf - jnp.sum(dkf * smk, axis=2, keepdims=True))
        dq_ref[lo:hi, :] = dqtg.reshape(ng * Dh, L)
        dk_ref[lo:hi, :] = dktg.reshape(ng * Dh, L)
        dv_ref[lo:hi, :] = dvt_g.reshape(ng * Dh, L)
    elif d - nl_rows > 0:
        dk_ref[nl_rows:, :] = jnp.zeros((d - nl_rows, L), jnp.float32)
        dv_ref[nl_rows:, :] = jnp.zeros((d - nl_rows, L), jnp.float32)

    # ---- input + weight grads ----
    # zᵀ = Wᵀ xnᵀ  ⇒  dxnᵀ = Σ W·dzᵀ ; dW = xnᵀᵀ... = xnt·dzᵀᵀ (in, out)
    dxnt = jnp.zeros((d, L), jnp.float32)
    dw_parts = []
    for dst, dz_ref in ((0, dq_ref), (1, dk_ref), (2, dv_ref)):
        dz = dz_ref[:].astype(cdtype)                         # (d_out, L)
        dxnt = dxnt + jax.lax.dot_general(
            w3_ref[dst].astype(cdtype), dz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dw_parts.append(jax.lax.dot_general(
            xnt, dz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ))                                                    # (d_in, d_out)
    dxn_ref[0] = dxnt.T.astype(dxn_ref.dtype)

    @pl.when(b == 0)
    def _init():
        for dst in range(3):
            dw3_ref[dst] = dw_parts[dst]
        dwo_ref[:] = dwo_c
        dbo_ref[:] = dbo_c

    @pl.when(b != 0)
    def _acc():
        for dst in range(3):
            dw3_ref[dst] = dw3_ref[dst] + dw_parts[dst]
        dwo_ref[:] = dwo_ref[:] + dwo_c
        dbo_ref[:] = dbo_ref[:] + dbo_c


def _fwd_call(xn, w3, wo, bo, *, local_heads, heads, window, vmem_limit_mb,
              interpret):
    B, L, d = xn.shape
    W = window
    nl_rows = local_heads * (d // heads)
    cdtype = xn.dtype
    precision = (
        jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    )
    kernel = functools.partial(
        _attn_fwd_kernel, local_heads=local_heads, heads=heads,
        window=window, precision=precision,
    )
    row = lambda: pl.BlockSpec((1, L, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    cst = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(3, d, d), cst(d, d), cst(1, d)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((B, L, d), cdtype),
        scratch_shapes=[
            pltpu.VMEM((3 * d, L), cdtype),                   # qᵀ/kᵀ/vᵀ
            pltpu.VMEM((max(nl_rows, 8), L + 2 * W), cdtype),  # K padded
            pltpu.VMEM((max(nl_rows, 8), L + 2 * W), cdtype),  # V padded
            pltpu.VMEM((d, L), cdtype),                       # attnᵀ
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, w3, wo, bo[None, :])


def _bwd_call(xn, w3, wo, dout, *, local_heads, heads, window,
              vmem_limit_mb, interpret):
    B, L, d = xn.shape
    W = window
    nl_rows = max(local_heads * (d // heads), 8)
    cdtype = xn.dtype
    precision = (
        jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    )
    kernel = functools.partial(
        _attn_bwd_kernel, local_heads=local_heads, heads=heads,
        window=window, precision=precision,
    )
    row = lambda: pl.BlockSpec((1, L, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    cst = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    dxn, dw3, dwo, dbo = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(3, d, d), cst(d, d), row()],
        out_specs=(row(), cst(3, d, d), cst(d, d), cst(1, d)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, d), cdtype),
            jax.ShapeDtypeStruct((3, d, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * d, L), cdtype),                   # qᵀ/kᵀ/vᵀ
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),         # K padded
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),         # V padded
            pltpu.VMEM((d, L), cdtype),                       # attnᵀ
            pltpu.VMEM((d, L), jnp.float32),                  # dqᵀ
            pltpu.VMEM((d, L), jnp.float32),                  # dkᵀ
            pltpu.VMEM((d, L), jnp.float32),                  # dvᵀ
            pltpu.VMEM((nl_rows, L + 2 * W), jnp.float32),    # dK padded
            pltpu.VMEM((nl_rows, L + 2 * W), jnp.float32),    # dV padded
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xn, w3, wo, dout)
    return dxn, dw3, dwo, dbo


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def attn_block(xn, w3, wo, bo, local_heads, heads, window,
               vmem_limit_mb, interpret):
    return _fwd_call(
        xn, w3, wo, bo, local_heads=local_heads, heads=heads, window=window,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )


def _attn_block_fwd(xn, w3, wo, bo, local_heads, heads, window,
                    vmem_limit_mb, interpret):
    out = _fwd_call(
        xn, w3, wo, bo, local_heads=local_heads, heads=heads, window=window,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )
    return out, (xn, w3, wo)


def _attn_block_bwd(local_heads, heads, window, vmem_limit_mb, interpret,
                    res, dout):
    xn, w3, wo = res
    dxn, dw3, dwo, dbo = _bwd_call(
        xn, w3, wo, dout.astype(xn.dtype), local_heads=local_heads,
        heads=heads, window=window, vmem_limit_mb=vmem_limit_mb,
        interpret=interpret,
    )
    return (
        dxn,
        dw3.astype(w3.dtype),
        dwo.astype(wo.dtype),
        dbo[0].astype(jnp.float32),
    )


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def split_attention_block(
    xn: jax.Array,               # (B, L, d) post-LayerNorm input
    wq: jax.Array, wk: jax.Array, wv: jax.Array,   # (d, d) (in, out)
    wo: jax.Array, bo: jax.Array,                  # (d, d), (d,)
    *,
    local_heads: int,
    heads: int,
    window: int = 128,
    vmem_limit_mb: int = 100,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused attention block → (B, L, d)."""
    cdtype = xn.dtype
    w3 = jnp.stack([wq, wk, wv]).astype(cdtype)
    return attn_block(
        xn, w3, wo.astype(cdtype), bo.astype(jnp.float32),
        local_heads, heads, window, vmem_limit_mb, interpret,
    )
