"""Whole-TransformerLayer custom VJP (Pallas TPU) — the Stage-3 training
fast path.

Extends ``attn_block_tpu`` (attention sub-block custom VJP, 253→158 ms/step)
to the FULL layer: pre-LN attention (+residual) and pre-LN FF (+residual)
fused into one kernel per direction.  The remaining per-layer XLA work was
measured at ~4.7 ms fwd+bwd for LN+FF alone (tools/exp_train_decomp.py) —
here the LayerNorms, GELU and both residuals never round-trip HBM, and the
backward recomputes everything from the layer input (the only saved
residual).

Math identical to ``models/proteoscribe.TransformerLayer`` (lucidrains
``linear_attention_transformer==0.19.1`` semantics; LN eps 1e-6 = flax
default, exact-erf GELU for training parity):

  v  = LN1(x)·γ1+β1 ;  a = AttnBlock(v) ;  xa = x + a
  u  = LN2(xa)·γ2+β2;  f = W2·gelu(W1·u + b1) + b2 ;  y = xa + f

Backward per row: FF/LN2 chain first (dxa), then attention/LN1 chain (dx),
with dγ/dβ/dW/db accumulated across the sequential grid (constant-index
output blocks, initialized at b == 0).

Dropout stays zero here (published config); the Flax graph remains the
fallback for nonzero-dropout training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.pallas.attn_block_tpu import (
    _band_mask_neg,
    _linear_fwd,
    _local_fwd,
    _stage_qkv,
)
from biom3_tpu.ops.pallas.fused_layer_tpu import _erf, _gelu

LN_EPS = 1e-6  # flax.linen.LayerNorm default — models/proteoscribe.py norms


def _ln_fwd(x, gamma, beta, eps=LN_EPS):
    """Returns (y, xhat, rstd); f32 in/out, stats over the last axis.
    ``eps`` parameterized so the ESM2 block kernel (fair-esm eps 1e-5)
    shares this implementation."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd(dy, xhat, rstd, gamma):
    """dx given upstream dy; also returns (dgamma, dbeta) contributions."""
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dxh = dy * gamma
    dx = rstd * (
        dxh
        - jnp.mean(dxh, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    )
    return dx, dg, db


def _gelu_grad(x, impl):
    if impl == "erf":
        phi = 0.5 * (1.0 + _erf(x * 0.7071067811865476))
        pdf = jnp.exp(-0.5 * x * x) * 0.3989422804014327
        return phi + x * pdf
    c = 0.7978845608028654
    inner = c * (x + 0.044715 * x * x * x)
    t = jnp.tanh(inner)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * c * (
        1.0 + 3 * 0.044715 * x * x
    )


def _attn_from_qkv(qkv_ref, kpad_ref, vpad_ref, attn_ref, *, nl, ng, Dh, d,
                   W, L, precision, cdtype, scale):
    if nl > 0:
        _local_fwd(qkv_ref, kpad_ref, vpad_ref, attn_ref, nl=nl, Dh=Dh,
                   W=W, L=L, precision=precision, cdtype=cdtype, scale=scale)
    lin = None
    if ng > 0:
        lin = _linear_fwd(qkv_ref, attn_ref, nl=nl, ng=ng, Dh=Dh, d=d,
                          precision=precision, cdtype=cdtype, scale=scale)
    return lin


def _stage_all(xnt, w3_ref, qkv_ref, kpad_ref, vpad_ref, *, nl_rows, W,
               precision, cdtype, nl):
    if nl > 0:
        kpad_ref[0:nl_rows, 0:W] = jnp.zeros((nl_rows, W), cdtype)
        kpad_ref[0:nl_rows, W + xnt.shape[1]:] = jnp.zeros((nl_rows, W), cdtype)
        vpad_ref[0:nl_rows, 0:W] = jnp.zeros((nl_rows, W), cdtype)
        vpad_ref[0:nl_rows, W + xnt.shape[1]:] = jnp.zeros((nl_rows, W), cdtype)
    for dst in range(3):
        _stage_qkv(xnt, w3_ref, dst, qkv_ref, kpad_ref, vpad_ref,
                   nl_rows=nl_rows, W=W, precision=precision, cdtype=cdtype)


def _layer_fwd_kernel(
    xb_ref, w3_ref, wo_ref, bo_ref, ls1_ref, lb1_ref, ls2_ref, lb2_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    qkv_ref, kpad_ref, vpad_ref, attn_ref, xa_ref,
    *, local_heads, heads, window, ff_block_l, precision, gelu,
):
    cdtype = qkv_ref.dtype
    L, d = xb_ref.shape[1], xb_ref.shape[2]
    F = w1_ref.shape[1]
    Dh = d // heads
    nl, ng = local_heads, heads - local_heads
    W = window
    scale = Dh ** -0.5

    x = xb_ref[0].astype(jnp.float32)                         # (L, d)
    v, _, _ = _ln_fwd(x, ls1_ref[0].astype(jnp.float32),
                      lb1_ref[0].astype(jnp.float32))
    xnt = v.astype(cdtype).T
    _stage_all(xnt, w3_ref, qkv_ref, kpad_ref, vpad_ref,
               nl_rows=nl * Dh, W=W, precision=precision, cdtype=cdtype,
               nl=nl)
    _attn_from_qkv(qkv_ref, kpad_ref, vpad_ref, attn_ref, nl=nl, ng=ng,
                   Dh=Dh, d=d, W=W, L=L, precision=precision, cdtype=cdtype,
                   scale=scale)
    a = jax.lax.dot_general(
        attn_ref[:], wo_ref[:].astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bo_ref[0].astype(jnp.float32)
    xa_ref[:] = x + a

    def ff_body(i, carry):
        off = pl.multiple_of(i * ff_block_l, ff_block_l)
        xa_c = xa_ref[pl.ds(off, ff_block_l), :]
        u, _u1, _u2 = _ln_fwd(xa_c, ls2_ref[0].astype(jnp.float32),
                              lb2_ref[0].astype(jnp.float32))
        h1 = jax.lax.dot_general(
            u.astype(cdtype), w1_ref[:].astype(cdtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b1_ref[0].astype(jnp.float32)
        g = _gelu(h1, gelu).astype(cdtype)
        f = jax.lax.dot_general(
            g, w2_ref[:].astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b2_ref[0].astype(jnp.float32)
        o_ref[0, pl.ds(off, ff_block_l), :] = (xa_c + f).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, L // ff_block_l, ff_body, None)


def _layer_bwd_kernel(
    xb_ref, w3_ref, wo_ref, bo_ref, ls1_ref, lb1_ref, ls2_ref, lb2_ref,
    w1_ref, b1_ref, w2_ref, dy_ref,
    dxb_ref, dw3_ref, dwo_ref, dbo_ref, dls1_ref, dlb1_ref,
    dls2_ref, dlb2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    qkv_ref, kpad_ref, vpad_ref, attn_ref, xa_ref, dxa_ref,
    dq_ref, dk_ref, dv_ref, dkpad_ref, dvpad_ref,
    *, local_heads, heads, window, ff_block_l, precision, gelu,
):
    b = pl.program_id(0)
    cdtype = qkv_ref.dtype
    L, d = xb_ref.shape[1], xb_ref.shape[2]
    F = w1_ref.shape[1]
    Dh = d // heads
    nl, ng = local_heads, heads - local_heads
    nl_rows = nl * Dh
    W = window
    nw = L // W
    scale = Dh ** -0.5

    @pl.when(b == 0)
    def _zero_weight_grads():
        dw3_ref[:] = jnp.zeros(dw3_ref.shape, jnp.float32)
        dwo_ref[:] = jnp.zeros(dwo_ref.shape, jnp.float32)
        dbo_ref[:] = jnp.zeros(dbo_ref.shape, jnp.float32)
        dls1_ref[:] = jnp.zeros(dls1_ref.shape, jnp.float32)
        dlb1_ref[:] = jnp.zeros(dlb1_ref.shape, jnp.float32)
        dls2_ref[:] = jnp.zeros(dls2_ref.shape, jnp.float32)
        dlb2_ref[:] = jnp.zeros(dlb2_ref.shape, jnp.float32)
        dw1_ref[:] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[:] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[:] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:] = jnp.zeros(db2_ref.shape, jnp.float32)

    # ---- recompute forward through the attention half ----
    x = xb_ref[0].astype(jnp.float32)
    g1 = ls1_ref[0].astype(jnp.float32)
    v, xhat1, rstd1 = _ln_fwd(x, g1, lb1_ref[0].astype(jnp.float32))
    xnt = v.astype(cdtype).T
    _stage_all(xnt, w3_ref, qkv_ref, kpad_ref, vpad_ref,
               nl_rows=nl_rows, W=W, precision=precision, cdtype=cdtype,
               nl=nl)
    lin = _attn_from_qkv(qkv_ref, kpad_ref, vpad_ref, attn_ref, nl=nl,
                         ng=ng, Dh=Dh, d=d, W=W, L=L, precision=precision,
                         cdtype=cdtype, scale=scale)
    a = jax.lax.dot_general(
        attn_ref[:], wo_ref[:].astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bo_ref[0].astype(jnp.float32)
    xa_ref[:] = x + a

    # ---- FF/LN2 backward (per block; y = xa + f) ----
    g2 = ls2_ref[0].astype(jnp.float32)

    def ff_bwd_body(i, _):
        off = pl.multiple_of(i * ff_block_l, ff_block_l)
        xa_c = xa_ref[pl.ds(off, ff_block_l), :]
        u, xhat2, rstd2 = _ln_fwd(xa_c, g2, lb2_ref[0].astype(jnp.float32))
        uc = u.astype(cdtype)
        h1 = jax.lax.dot_general(
            uc, w1_ref[:].astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b1_ref[0].astype(jnp.float32)
        g = _gelu(h1, gelu).astype(cdtype)
        dy_c = dy_ref[0, pl.ds(off, ff_block_l), :].astype(jnp.float32)
        dyc_c = dy_c.astype(cdtype)
        dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
            g, dyc_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db2_ref[:] = db2_ref[:] + jnp.sum(dy_c, axis=0, keepdims=True)
        dg = jax.lax.dot_general(
            dyc_c, w2_ref[:].astype(cdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                     # (blk, F)
        dh1 = (dg * _gelu_grad(h1, gelu)).astype(cdtype)
        dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
            uc, dh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db1_ref[:] = db1_ref[:] + jnp.sum(
            dh1.astype(jnp.float32), axis=0, keepdims=True
        )
        du = jax.lax.dot_general(
            dh1, w1_ref[:].astype(cdtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                     # (blk, d)
        dxa_ln, dg2, db2 = _ln_bwd(du, xhat2, rstd2, g2)
        dls2_ref[:] = dls2_ref[:] + dg2
        dlb2_ref[:] = dlb2_ref[:] + db2
        dxa_ref[pl.ds(off, ff_block_l), :] = dy_c + dxa_ln
        return _

    jax.lax.fori_loop(0, L // ff_block_l, ff_bwd_body, None)

    # ---- attention backward (mirror of attn_block_tpu) ----
    dxa = dxa_ref[:]                                          # (L, d) f32
    dxa_c = dxa.astype(cdtype)
    dwo_ref[:] = dwo_ref[:] + jax.lax.dot_general(
        attn_ref[:].astype(cdtype), dxa_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dbo_ref[:] = dbo_ref[:] + jnp.sum(dxa, axis=0, keepdims=True)
    dattn = jax.lax.dot_general(
        wo_ref[:].astype(cdtype), dxa_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                          # (d, L)

    dq_ref[:] = jnp.zeros((d, L), jnp.float32)
    if nl > 0:
        dkpad_ref[:] = jnp.zeros(dkpad_ref.shape, jnp.float32)
        dvpad_ref[:] = jnp.zeros(dvpad_ref.shape, jnp.float32)
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
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pc = p.astype(cdtype)
            davt = (
                dv_ref[0:nl_rows, pl.ds(off, W)].astype(cdtype)
            ).reshape(nl, Dh, W)
            dvn = jax.lax.dot_general(
                davt, pc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dvpad_ref[0:nl_rows, pl.ds(off, 3 * W)] = (
                dvpad_ref[0:nl_rows, pl.ds(off, 3 * W)]
                + dvn.reshape(nl_rows, 3 * W)
            )
            dp = jax.lax.dot_general(
                davt, vn, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  * scale).astype(cdtype)
            dqw = jax.lax.dot_general(
                kn, ds, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dq_ref[0:nl_rows, pl.ds(off, W)] = dqw.reshape(nl_rows, W)
            dkn = jax.lax.dot_general(
                qw, ds, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dkpad_ref[0:nl_rows, pl.ds(off, 3 * W)] = (
                dkpad_ref[0:nl_rows, pl.ds(off, 3 * W)]
                + dkn.reshape(nl_rows, 3 * W)
            )
            return _

        jax.lax.fori_loop(0, nw, body, None)
        dk_ref[0:nl_rows, :] = dkpad_ref[0:nl_rows, W:W + L]
        dv_ref[0:nl_rows, :] = dvpad_ref[0:nl_rows, W:W + L]

    if ng > 0:
        qtg, ktg, vtg, qf, kf, ctx = lin
        lo, hi = nl_rows, d
        dlin = dattn[lo:hi, :].reshape(ng, Dh, L).astype(cdtype)
        dctx = jax.lax.dot_general(
            qf, dlin, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)
        dqf = jax.lax.dot_general(
            ctx, dlin, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dkf = jax.lax.dot_general(
            dctx, vtg.astype(cdtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dvt_g = jax.lax.dot_general(
            dctx, kf, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )
        smq = jax.nn.softmax(qtg, axis=1)
        dsq = dqf * scale
        dqtg = smq * (dsq - jnp.sum(dsq * smq, axis=1, keepdims=True))
        smk = jax.nn.softmax(ktg, axis=2)
        dktg = smk * (dkf - jnp.sum(dkf * smk, axis=2, keepdims=True))
        dq_ref[lo:hi, :] = dqtg.reshape(ng * Dh, L)
        dk_ref[lo:hi, :] = dktg.reshape(ng * Dh, L)
        dv_ref[lo:hi, :] = dvt_g.reshape(ng * Dh, L)
    elif d - nl_rows > 0:
        dk_ref[nl_rows:, :] = jnp.zeros((d - nl_rows, L), jnp.float32)
        dv_ref[nl_rows:, :] = jnp.zeros((d - nl_rows, L), jnp.float32)

    dvt_sum = jnp.zeros((d, L), jnp.float32)
    for dst, dz_ref in ((0, dq_ref), (1, dk_ref), (2, dv_ref)):
        dz = dz_ref[:].astype(cdtype)
        dvt_sum = dvt_sum + jax.lax.dot_general(
            w3_ref[dst].astype(cdtype), dz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dw3_ref[dst] = dw3_ref[dst] + jax.lax.dot_general(
            xnt, dz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    dv_ln = dvt_sum.T                                         # (L, d)
    dx_ln, dg1, db1_ = _ln_bwd(dv_ln, xhat1, rstd1, g1)
    dls1_ref[:] = dls1_ref[:] + dg1
    dlb1_ref[:] = dlb1_ref[:] + db1_
    dxb_ref[0] = (dxa + dx_ln).astype(dxb_ref.dtype)


def _specs(L, d):
    row = lambda: pl.BlockSpec((1, L, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    cst = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    return row, cst


def _fwd_call(xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2, *,
              local_heads, heads, window, ff_block_l, gelu, vmem_limit_mb,
              interpret):
    B, L, d = xb.shape
    F = w1.shape[1]
    W = window
    nl_rows = max(local_heads * (d // heads), 8)
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, d)
    kernel = functools.partial(
        _layer_fwd_kernel, local_heads=local_heads, heads=heads,
        window=window, ff_block_l=ff_block_l, precision=precision, gelu=gelu,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(3, d, d), cst(d, d), cst(1, d),
                  cst(1, d), cst(1, d), cst(1, d), cst(1, d),
                  cst(d, F), cst(1, F), cst(F, d), cst(1, d)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((B, L, d), cdtype),
        scratch_shapes=[
            pltpu.VMEM((3 * d, L), cdtype),
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),
            pltpu.VMEM((d, L), cdtype),
            pltpu.VMEM((L, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, w3, wo, bo[None, :], ls1[None, :], lb1[None, :],
      ls2[None, :], lb2[None, :], w1, b1[None, :], w2, b2[None, :])


def _bwd_call(xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, dy, *,
              local_heads, heads, window, ff_block_l, gelu, vmem_limit_mb,
              interpret):
    B, L, d = xb.shape
    F = w1.shape[1]
    W = window
    nl_rows = max(local_heads * (d // heads), 8)
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, d)
    kernel = functools.partial(
        _layer_bwd_kernel, local_heads=local_heads, heads=heads,
        window=window, ff_block_l=ff_block_l, precision=precision, gelu=gelu,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(3, d, d), cst(d, d), cst(1, d),
                  cst(1, d), cst(1, d), cst(1, d), cst(1, d),
                  cst(d, F), cst(1, F), cst(F, d), row()],
        out_specs=(row(), cst(3, d, d), cst(d, d), cst(1, d),
                   cst(1, d), cst(1, d), cst(1, d), cst(1, d),
                   cst(d, F), cst(1, F), cst(F, d), cst(1, d)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, d), cdtype),
            jax.ShapeDtypeStruct((3, d, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * d, L), cdtype),
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),
            pltpu.VMEM((nl_rows, L + 2 * W), cdtype),
            pltpu.VMEM((d, L), cdtype),
            pltpu.VMEM((L, d), jnp.float32),
            pltpu.VMEM((L, d), jnp.float32),
            pltpu.VMEM((d, L), jnp.float32),
            pltpu.VMEM((d, L), jnp.float32),
            pltpu.VMEM((d, L), jnp.float32),
            pltpu.VMEM((nl_rows, L + 2 * W), jnp.float32),
            pltpu.VMEM((nl_rows, L + 2 * W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, w3, wo, bo[None, :], ls1[None, :], lb1[None, :],
      ls2[None, :], lb2[None, :], w1, b1[None, :], w2, dy)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18))
def layer_block(xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2,
                local_heads, heads, window, ff_block_l, gelu,
                vmem_limit_mb, interpret):
    return _fwd_call(
        xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2,
        local_heads=local_heads, heads=heads, window=window,
        ff_block_l=ff_block_l, gelu=gelu, vmem_limit_mb=vmem_limit_mb,
        interpret=interpret,
    )


def _layer_block_fwd(xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2,
                     local_heads, heads, window, ff_block_l, gelu,
                     vmem_limit_mb, interpret):
    out = _fwd_call(
        xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2,
        local_heads=local_heads, heads=heads, window=window,
        ff_block_l=ff_block_l, gelu=gelu, vmem_limit_mb=vmem_limit_mb,
        interpret=interpret,
    )
    return out, (xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2)


def _layer_block_bwd(local_heads, heads, window, ff_block_l, gelu,
                     vmem_limit_mb, interpret, res, dy):
    xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2 = res
    (dxb, dw3, dwo, dbo, dls1, dlb1, dls2, dlb2, dw1, db1, dw2,
     db2) = _bwd_call(
        xb, w3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, dy.astype(xb.dtype),
        local_heads=local_heads, heads=heads, window=window,
        ff_block_l=ff_block_l, gelu=gelu, vmem_limit_mb=vmem_limit_mb,
        interpret=interpret,
    )
    return (
        dxb,
        dw3.astype(w3.dtype), dwo.astype(wo.dtype), dbo[0].astype(bo.dtype),
        dls1[0].astype(ls1.dtype), dlb1[0].astype(lb1.dtype),
        dls2[0].astype(ls2.dtype), dlb2[0].astype(lb2.dtype),
        dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype), db2[0].astype(jnp.float32),
    )


layer_block.defvjp(_layer_block_fwd, _layer_block_bwd)


def transformer_layer_block(
    xb: jax.Array,               # (B, L, d) layer input (x + per-layer bias)
    wq, wk, wv,                  # (d, d) (in, out), bias-free
    wo, bo,                      # (d, d), (d,)
    ls1, lb1, ls2, lb2,          # (d,) LayerNorm params
    w1, b1, w2, b2,              # (d, F), (F,), (F, d), (d,)
    *,
    local_heads: int,
    heads: int,
    window: int = 128,
    ff_block_l: int = 256,
    gelu: str = "erf",
    vmem_limit_mb: int = 100,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused TransformerLayer → (B, L, d)."""
    d = xb.shape[-1]
    if not interpret and (window % 128 or d % 128):
        # Mosaic requires lane-dim slice offsets to be 128-multiples; a
        # 64-token window fails hardware compile ("cannot statically prove
        # that index ... is a multiple of 128") even though interpret mode
        # accepts it.  The published config (window=128, d=512) is fine.
        raise ValueError(
            f"layer-block kernel needs window % 128 == 0 and dim % 128 == 0 "
            f"on TPU (got window={window}, dim={d}); use attn_impl='xla'"
        )
    L = xb.shape[1]
    if local_heads and L % window:
        # the local-attention fori_loop covers L//window full windows; a
        # ragged tail would be read back uninitialized (NaN/garbage output
        # AND poisoned weight grads) — fail loudly in every mode
        raise ValueError(
            f"layer-block kernel needs L % window == 0 with local heads "
            f"(got L={L}, window={window}); pad L or use attn_impl='xla'"
        )
    cdtype = xb.dtype
    ff_block_l = min(ff_block_l, L)
    while L % ff_block_l:
        ff_block_l //= 2
    w3 = jnp.stack([wq, wk, wv]).astype(cdtype)
    f32 = lambda z: jnp.asarray(z, jnp.float32)
    return layer_block(
        xb, w3, wo.astype(cdtype), f32(bo), f32(ls1), f32(lb1), f32(ls2),
        f32(lb2), w1.astype(cdtype), f32(b1), w2.astype(cdtype), f32(b2),
        local_heads, heads, window, ff_block_l, gelu, vmem_limit_mb,
        interpret,
    )
