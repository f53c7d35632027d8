"""ESM2 layer custom VJPs (Pallas TPU) — the Stage-1 training fast path.

Twin of ``layer_block_tpu`` (the Stage-3 training kernel, 253→114.7 ms/step)
for the ESM2 tower layer (ref fair-esm ``TransformerLayer``; Flax twin
``models/esm2.ESM2Layer``): pre-LN rotary full attention with key-padding
mask (SURVEY Q3), and pre-LN E→4E GELU→E FF, each fused into one kernel per
direction with residuals.  The backward recomputes everything from the layer
input — per-head (L, L) f32 score matrices fit VMEM at the published shape
(1024² f32 = 4 MB), so no flash-style tiling is needed.

Two ops instead of one whole-layer kernel: at ESM2-650M scale the f32
weight-gradient accumulators alone are 26 MB (w3) + 52 MB (FF) — one kernel
holding both plus activations would exceed the 128 MB VMEM.  Split, each
direction stays under ~100 MB.

  esm2_attn_block(x, padneg, …) = x + OutProj(Softmax(rot(q)·rot(k)ᵀ·s + m)·v)
  ff_residual_block(x, …)       = x + W2·gelu(W1·LN(x) + b1) + b2

Single-chip training path: GSPMD has no partitioning rule for these
pallas_calls, so the sharded multi-chip step (`training/sharded.py`)
keeps the XLA graph; `--layer-mode layer_block` applies to one-chip runs
(where the reference trains multi-GPU, our multi-chip story is the
GSPMD/XLA step — proven in the driver dryrun).

Math identical to ``ESM2Layer`` (LN eps 1e-5, qkv biases, GPT-NeoX rotary
over the full head dim as a ±1 permutation matmul — bit-exact vs
``ops/rotary.apply_rotary``, same tables as the serving kernel
``esm2_stack_tpu``).  Weight grads accumulate in f32 across the batch grid
(constant-index output blocks, zeroed at b == 0).  Dropout stays zero here
(ESM2 has none); training dtype policy is bf16 matmuls + f32
LN/softmax/accumulation, f32 inputs run HIGHEST precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.pallas.fused_layer_tpu import _gelu
from biom3_tpu.ops.pallas.layer_block_tpu import (
    _gelu_grad,
    _ln_bwd,
    _ln_fwd as _ln_fwd_generic,
    _specs,
)

LN_EPS = 1e-5  # fair-esm LayerNorm eps — models/esm2.py:99,101
NEG_INF = -1e9  # PAD-key mask value (single source; models/esm2.py imports)

# shared LN fwd/bwd with layer_block_tpu, at fair-esm's eps
_ln_fwd = functools.partial(_ln_fwd_generic, eps=LN_EPS)


def rotary_tables(L: int, Dh: int):
    """(cost, sint) (Dh, L) f32 + Pᵀ (Dh, Dh) — the transposed GPT-NeoX
    tables of the serving kernel (esm2_stack_tpu, bit-exact vs
    ops/rotary.apply_rotary)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, Dh, 2, dtype=np.float32) / Dh))
    t = np.arange(L, dtype=np.float32)
    freqs = np.concatenate([t[:, None] * inv_freq[None, :]] * 2, axis=-1)
    h2 = Dh // 2
    ptm = np.zeros((Dh, Dh), np.float32)
    ptm[np.arange(h2), np.arange(h2) + h2] = -1.0
    ptm[np.arange(h2) + h2, np.arange(h2)] = 1.0
    return (jnp.asarray(np.cos(freqs).T), jnp.asarray(np.sin(freqs).T),
            jnp.asarray(ptm))


def _stage_qkv(xnt, w3_ref, b3_ref, qkv_ref, *, E, precision, cdtype):
    """qkv_ref (3E, L) ← Wᵀ·xnt + b for the three projections (biased —
    unlike the Stage-3 layer)."""
    for dst in range(3):
        out = jax.lax.dot_general(
            w3_ref[dst].astype(cdtype), xnt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        qkv_ref[dst * E:(dst + 1) * E, :] = (
            out + b3_ref[dst, 0].astype(jnp.float32)[:, None]
        ).astype(cdtype)


def _head_fwd(qkv_ref, attn_ref, padneg, cost, sint, pt, *, heads, Dh, E,
              scale, precision, cdtype):
    """Fill attn_ref (E, L) with per-head rotary softmax attention."""
    def rot(zt):
        zp = jax.lax.dot_general(
            pt, zt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)
        return zt * cost + zp * sint

    def head_body(hd, _):
        off = pl.multiple_of(hd * Dh, Dh)
        qh = rot(qkv_ref[pl.ds(off, Dh), :])
        kh = rot(qkv_ref[pl.ds(E + off, Dh), :])
        vh = qkv_ref[pl.ds(2 * E + off, Dh), :]
        dots = jax.lax.dot_general(
            qh, kh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale + padneg                                   # (Lq, Lk) f32
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
        attn_ref[pl.ds(off, Dh), :] = jax.lax.dot_general(
            vh, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)                                     # (Dh, Lq)
        return _

    jax.lax.fori_loop(0, heads, head_body, None)


def _attn_fwd_kernel(
    xb_ref, pn_ref, cost_ref, sint_ref, pt_ref,
    w3_ref, b3_ref, wo_ref, bo_ref, ls1_ref, lb1_ref,
    o_ref,
    qkv_ref, attn_ref,
    *, heads, precision,
):
    cdtype = qkv_ref.dtype
    L, E = xb_ref.shape[1], xb_ref.shape[2]
    Dh = E // heads
    scale = Dh ** -0.5

    x = xb_ref[0].astype(jnp.float32)                        # (L, E)
    v, _, _ = _ln_fwd(x, ls1_ref[0].astype(jnp.float32),
                      lb1_ref[0].astype(jnp.float32))
    xnt = v.astype(cdtype).T                                 # (E, L)
    _stage_qkv(xnt, w3_ref, b3_ref, qkv_ref, E=E, precision=precision,
               cdtype=cdtype)
    _head_fwd(qkv_ref, attn_ref, pn_ref[0].astype(jnp.float32),
              cost_ref[:].astype(cdtype), sint_ref[:].astype(cdtype),
              pt_ref[:].astype(cdtype), heads=heads, Dh=Dh, E=E,
              scale=scale, precision=precision, cdtype=cdtype)
    out = jax.lax.dot_general(
        attn_ref[:], wo_ref[:].astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                        # (L, E)
    o_ref[0] = (x + out + bo_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_bwd_kernel(
    xb_ref, pn_ref, cost_ref, sint_ref, pt_ref,
    w3_ref, b3_ref, wo_ref, ls1_ref, lb1_ref, dy_ref,
    dxb_ref, dw3_ref, db3_ref, dwo_ref, dbo_ref, dls1_ref, dlb1_ref,
    qkv_ref, datt_ref, dqkv_ref,
    *, heads, precision,
):
    b = pl.program_id(0)
    cdtype = qkv_ref.dtype
    L, E = xb_ref.shape[1], xb_ref.shape[2]
    Dh = E // heads
    scale = Dh ** -0.5

    @pl.when(b == 0)
    def _zero():
        dw3_ref[:] = jnp.zeros(dw3_ref.shape, jnp.float32)
        db3_ref[:] = jnp.zeros(db3_ref.shape, jnp.float32)
        dwo_ref[:] = jnp.zeros(dwo_ref.shape, jnp.float32)
        dbo_ref[:] = jnp.zeros(dbo_ref.shape, jnp.float32)
        dls1_ref[:] = jnp.zeros(dls1_ref.shape, jnp.float32)
        dlb1_ref[:] = jnp.zeros(dlb1_ref.shape, jnp.float32)

    # ---- recompute the forward up to the staged q/k/v ----
    x = xb_ref[0].astype(jnp.float32)
    g1 = ls1_ref[0].astype(jnp.float32)
    v, xhat1, rstd1 = _ln_fwd(x, g1, lb1_ref[0].astype(jnp.float32))
    xnt = v.astype(cdtype).T
    _stage_qkv(xnt, w3_ref, b3_ref, qkv_ref, E=E, precision=precision,
               cdtype=cdtype)
    padneg = pn_ref[0].astype(jnp.float32)                   # (1, L)
    cost = cost_ref[:].astype(cdtype)
    sint = sint_ref[:].astype(cdtype)
    pt = pt_ref[:].astype(cdtype)

    # ---- output-projection backward (the attn-matrix side of dwo is
    # accumulated per head inside head_bwd: dwo's row strip [off, off+Dh)
    # depends only on head hd's attention output, so the strips fold into
    # the gradient loop and the scores are recomputed ONCE, not twice) ----
    dy = dy_ref[0].astype(jnp.float32)                       # (L, E)
    dyc = dy.astype(cdtype)
    dbo_ref[:] = dbo_ref[:] + jnp.sum(dy, axis=0, keepdims=True)
    datt_ref[:] = jax.lax.dot_general(
        wo_ref[:].astype(cdtype), dyc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                         # (E, L)

    # ---- per-head attention backward (recomputes scores; (L, L) f32
    # fits VMEM so no flash tiling) ----
    def rot(zt):
        zp = jax.lax.dot_general(
            pt, zt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)
        return zt * cost + zp * sint

    def unrot(dz):
        # y = z·cos + (P z)·sin  ⇒  dz = dy·cos + Pᵀ(dy·sin)
        return dz * cost.astype(jnp.float32) + jax.lax.dot_general(
            pt, (dz * sint.astype(jnp.float32)).astype(cdtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    def head_bwd(hd, _):
        off = pl.multiple_of(hd * Dh, Dh)
        qh = rot(qkv_ref[pl.ds(off, Dh), :])
        kh = rot(qkv_ref[pl.ds(E + off, Dh), :])
        vh = qkv_ref[pl.ds(2 * E + off, Dh), :]
        dots = jax.lax.dot_general(
            qh, kh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale + padneg
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)           # (Lq, Lk) f32
        pc = p.astype(cdtype)

        # this head's attention-output strip → its dwo row strip
        attn_s = jax.lax.dot_general(
            vh, pc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)                                     # (Dh, Lq)
        dwo_ref[pl.ds(off, Dh), :] = dwo_ref[
            pl.ds(off, Dh), :
        ] + jax.lax.dot_general(
            attn_s, dyc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

        davh = datt_ref[pl.ds(off, Dh), :]                   # (Dh, Lq)
        dvh = jax.lax.dot_general(
            davh, pc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (Dh, Lk) f32
        dp = jax.lax.dot_general(
            davh, vh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (Lq, Lk) f32
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(cdtype)
        dqrot = jax.lax.dot_general(
            kh, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (Dh, Lq) f32
        dkrot = jax.lax.dot_general(
            qh, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (Dh, Lk) f32
        acc_t = dqkv_ref.dtype
        dqkv_ref[pl.ds(off, Dh), :] = unrot(dqrot).astype(acc_t)
        dqkv_ref[pl.ds(E + off, Dh), :] = unrot(dkrot).astype(acc_t)
        dqkv_ref[pl.ds(2 * E + off, Dh), :] = dvh.astype(acc_t)
        return _

    jax.lax.fori_loop(0, heads, head_bwd, None)

    # ---- projection weight/bias grads + LN1 backward ----
    ones_row = jnp.ones((1, L), cdtype)
    dvt_sum = jnp.zeros((E, L), jnp.float32)
    for dst in range(3):
        dz = dqkv_ref[dst * E:(dst + 1) * E, :].astype(cdtype)
        dw3_ref[dst] = dw3_ref[dst] + jax.lax.dot_general(
            xnt, dz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (E_in, E_out)
        db3_ref[dst] = db3_ref[dst] + jax.lax.dot_general(
            ones_row, dz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (1, E)
        dvt_sum = dvt_sum + jax.lax.dot_general(
            w3_ref[dst].astype(cdtype), dz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (E_in, L)
    dx_ln, dg1, db1_ = _ln_bwd(dvt_sum.T, xhat1, rstd1, g1)
    dls1_ref[:] = dls1_ref[:] + dg1
    dlb1_ref[:] = dlb1_ref[:] + db1_
    dxb_ref[0] = (dy + dx_ln).astype(dxb_ref.dtype)


def _ff_fwd_kernel(
    xb_ref, ls2_ref, lb2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, ff_block_l, gelu, precision,
):
    cdtype = w1_ref.dtype
    L = xb_ref.shape[1]
    g2 = ls2_ref[0].astype(jnp.float32)
    b2v = lb2_ref[0].astype(jnp.float32)

    def body(i, _):
        off = pl.multiple_of(i * ff_block_l, ff_block_l)
        xc = xb_ref[0, pl.ds(off, ff_block_l), :].astype(jnp.float32)
        u, _1, _2 = _ln_fwd(xc, g2, b2v)
        h1 = jax.lax.dot_general(
            u.astype(cdtype), w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b1_ref[0].astype(jnp.float32)
        g = _gelu(h1, gelu).astype(cdtype)
        f = jax.lax.dot_general(
            g, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + b2_ref[0].astype(jnp.float32)
        o_ref[0, pl.ds(off, ff_block_l), :] = (xc + f).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, L // ff_block_l, body, None)


def _ff_bwd_kernel(
    xb_ref, ls2_ref, lb2_ref, w1_ref, b1_ref, w2_ref, dy_ref,
    dxb_ref, dls2_ref, dlb2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, ff_block_l, gelu, precision,
):
    b = pl.program_id(0)
    cdtype = w1_ref.dtype
    L = xb_ref.shape[1]

    @pl.when(b == 0)
    def _zero():
        dls2_ref[:] = jnp.zeros(dls2_ref.shape, jnp.float32)
        dlb2_ref[:] = jnp.zeros(dlb2_ref.shape, jnp.float32)
        dw1_ref[:] = jnp.zeros(dw1_ref.shape, jnp.float32)
        db1_ref[:] = jnp.zeros(db1_ref.shape, jnp.float32)
        dw2_ref[:] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:] = jnp.zeros(db2_ref.shape, jnp.float32)

    g2 = ls2_ref[0].astype(jnp.float32)
    b2v = lb2_ref[0].astype(jnp.float32)

    def body(i, _):
        off = pl.multiple_of(i * ff_block_l, ff_block_l)
        xc = xb_ref[0, pl.ds(off, ff_block_l), :].astype(jnp.float32)
        u, xhat2, rstd2 = _ln_fwd(xc, g2, b2v)
        uc = u.astype(cdtype)
        h1 = jax.lax.dot_general(
            uc, w1_ref[:], (((1,), (0,)), ((), ())),
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
            dyc_c, w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (blk, F)
        dh1 = (dg * _gelu_grad(h1, gelu)).astype(cdtype)
        dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
            uc, dh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        db1_ref[:] = db1_ref[:] + jnp.sum(
            dh1.astype(jnp.float32), axis=0, keepdims=True
        )
        du = jax.lax.dot_general(
            dh1, w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                    # (blk, E)
        dx_ln, dg2, db2g = _ln_bwd(du, xhat2, rstd2, g2)
        dls2_ref[:] = dls2_ref[:] + dg2
        dlb2_ref[:] = dlb2_ref[:] + db2g
        dxb_ref[0, pl.ds(off, ff_block_l), :] = (
            dy_c + dx_ln
        ).astype(dxb_ref.dtype)
        return _

    jax.lax.fori_loop(0, L // ff_block_l, body, None)


def _attn_fwd_call(xb, pn, cost, sint, pt, w3, b3, wo, bo, ls1, lb1, *,
                   heads, vmem_limit_mb, interpret):
    B, L, E = xb.shape
    Dh = E // heads
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, E)
    pn_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_attn_fwd_kernel, heads=heads,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), pn_spec, cst(Dh, L), cst(Dh, L), cst(Dh, Dh),
                  cst(3, E, E), cst(3, 1, E), cst(E, E), cst(1, E),
                  cst(1, E), cst(1, E)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((B, L, E), cdtype),
        scratch_shapes=[
            pltpu.VMEM((3 * E, L), cdtype),
            pltpu.VMEM((E, L), cdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, pn[:, None, :], cost, sint, pt, w3, b3[:, None, :], wo,
      bo[None, :], ls1[None, :], lb1[None, :])


def _attn_bwd_call(xb, pn, cost, sint, pt, w3, b3, wo, ls1, lb1, dy, *,
                   heads, vmem_limit_mb, interpret, dqkv_dtype=jnp.float32):
    B, L, E = xb.shape
    Dh = E // heads
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, E)
    pn_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_attn_bwd_kernel, heads=heads,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), pn_spec, cst(Dh, L), cst(Dh, L), cst(Dh, Dh),
                  cst(3, E, E), cst(3, 1, E), cst(E, E),
                  cst(1, E), cst(1, E), row()],
        out_specs=(row(), cst(3, E, E), cst(3, 1, E), cst(E, E), cst(1, E),
                   cst(1, E), cst(1, E)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, E), cdtype),
            jax.ShapeDtypeStruct((3, E, E), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, E), jnp.float32),
            jax.ShapeDtypeStruct((E, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * E, L), cdtype),
            pltpu.VMEM((E, L), cdtype),
            # dqkv staging: bf16 halves this 15.7 MB (full size) buffer if
            # the f32 layout overflows VMEM; the dw3/db3/dvt matmuls read
            # it back in cdtype either way
            pltpu.VMEM((3 * E, L), dqkv_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, pn[:, None, :], cost, sint, pt, w3, b3[:, None, :], wo,
      ls1[None, :], lb1[None, :], dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _attn_block(xb, pn, cost, sint, pt, w3, b3, wo, bo, ls1, lb1,
                heads, vmem_limit_mb, interpret, dqkv_dtype):
    return _attn_fwd_call(
        xb, pn, cost, sint, pt, w3, b3, wo, bo, ls1, lb1,
        heads=heads, vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )


def _attn_block_fwd(xb, pn, cost, sint, pt, w3, b3, wo, bo, ls1, lb1,
                    heads, vmem_limit_mb, interpret, dqkv_dtype):
    out = _attn_fwd_call(
        xb, pn, cost, sint, pt, w3, b3, wo, bo, ls1, lb1,
        heads=heads, vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )
    return out, (xb, pn, cost, sint, pt, w3, b3, wo, ls1, lb1)


def _attn_block_bwd(heads, vmem_limit_mb, interpret, dqkv_dtype, res, dy):
    xb, pn, cost, sint, pt, w3, b3, wo, ls1, lb1 = res
    dxb, dw3, db3, dwo, dbo, dls1, dlb1 = _attn_bwd_call(
        xb, pn, cost, sint, pt, w3, b3, wo, ls1, lb1, dy.astype(xb.dtype),
        heads=heads, vmem_limit_mb=vmem_limit_mb, interpret=interpret,
        dqkv_dtype=dqkv_dtype,
    )
    zero = lambda z: jnp.zeros_like(z)
    return (
        dxb, zero(pn), zero(cost), zero(sint), zero(pt),
        dw3.astype(w3.dtype), db3[:, 0].astype(b3.dtype),
        dwo.astype(wo.dtype), dbo[0], dls1[0], dlb1[0],
    )


_attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)


def esm2_attn_block(
    x: jax.Array,                # (B, L, E) layer input
    padneg: jax.Array,           # (B, L) f32: 0 keep / -1e9 PAD keys (Q3)
    w3: jax.Array,               # (3, E, E) stacked q/k/v kernels (in, out)
    b3: jax.Array,               # (3, E)
    wo: jax.Array, bo: jax.Array,    # (E, E), (E,)
    ls1: jax.Array, lb1: jax.Array,  # (E,) self_attn_layer_norm
    *,
    heads: int,
    vmem_limit_mb: int = 120,
    interpret: bool = False,
    dqkv_dtype=jnp.float32,
) -> jax.Array:
    """Differentiable fused pre-LN rotary attention half → x + attn_out."""
    B, L, E = x.shape
    if not interpret and (E % 128 or L % 128):
        raise ValueError(f"esm2_attn_block needs E % 128 == 0 and "
                         f"L % 128 == 0 on TPU (got E={E}, L={L})")
    if E % heads:
        # the head fori_loop writes heads·Dh rows of the attention scratch;
        # a non-dividing head count would leave the tail uninitialized
        # (silent garbage in output AND weight grads) — fail loudly instead
        raise ValueError(f"esm2_attn_block needs E % heads == 0 "
                         f"(got E={E}, heads={heads})")
    cost, sint, pt = rotary_tables(L, E // heads)
    f32 = lambda z: jnp.asarray(z, jnp.float32)
    return _attn_block(
        x, f32(padneg), cost, sint, pt, w3.astype(x.dtype), f32(b3),
        wo.astype(x.dtype), f32(bo), f32(ls1), f32(lb1),
        heads, vmem_limit_mb, interpret, dqkv_dtype,
    )


def _ff_fwd_call(xb, ls2, lb2, w1, b1, w2, b2, *, ff_block_l, gelu,
                 vmem_limit_mb, interpret):
    B, L, E = xb.shape
    F = w1.shape[1]
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, E)
    kernel = functools.partial(_ff_fwd_kernel, ff_block_l=ff_block_l,
                               gelu=gelu, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(1, E), cst(1, E), cst(E, F), cst(1, F),
                  cst(F, E), cst(1, E)],
        out_specs=row(),
        out_shape=jax.ShapeDtypeStruct((B, L, E), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, ls2[None, :], lb2[None, :], w1, b1[None, :], w2, b2[None, :])


def _ff_bwd_call(xb, ls2, lb2, w1, b1, w2, dy, *, ff_block_l, gelu,
                 vmem_limit_mb, interpret):
    B, L, E = xb.shape
    F = w1.shape[1]
    cdtype = xb.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    row, cst = _specs(L, E)
    kernel = functools.partial(_ff_bwd_kernel, ff_block_l=ff_block_l,
                               gelu=gelu, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row(), cst(1, E), cst(1, E), cst(E, F), cst(1, F),
                  cst(F, E), row()],
        out_specs=(row(), cst(1, E), cst(1, E), cst(E, F), cst(1, F),
                   cst(F, E), cst(1, E)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, E), cdtype),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((E, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, ls2[None, :], lb2[None, :], w1, b1[None, :], w2, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _ff_block(xb, ls2, lb2, w1, b1, w2, b2, ff_block_l, gelu,
              vmem_limit_mb, interpret):
    return _ff_fwd_call(
        xb, ls2, lb2, w1, b1, w2, b2, ff_block_l=ff_block_l, gelu=gelu,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )


def _ff_block_fwd(xb, ls2, lb2, w1, b1, w2, b2, ff_block_l, gelu,
                  vmem_limit_mb, interpret):
    out = _ff_fwd_call(
        xb, ls2, lb2, w1, b1, w2, b2, ff_block_l=ff_block_l, gelu=gelu,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )
    return out, (xb, ls2, lb2, w1, b1, w2)


def _ff_block_bwd(ff_block_l, gelu, vmem_limit_mb, interpret, res, dy):
    xb, ls2, lb2, w1, b1, w2 = res
    dxb, dls2, dlb2, dw1, db1, dw2, db2 = _ff_bwd_call(
        xb, ls2, lb2, w1, b1, w2, dy.astype(xb.dtype),
        ff_block_l=ff_block_l, gelu=gelu, vmem_limit_mb=vmem_limit_mb,
        interpret=interpret,
    )
    return (dxb, dls2[0], dlb2[0], dw1.astype(w1.dtype), db1[0],
            dw2.astype(w2.dtype), db2[0])


_ff_block.defvjp(_ff_block_fwd, _ff_block_bwd)


def ff_residual_block(
    x: jax.Array,                    # (B, L, E)
    ls2: jax.Array, lb2: jax.Array,  # (E,) final_layer_norm
    w1: jax.Array, b1: jax.Array,    # (E, F), (F,)
    w2: jax.Array, b2: jax.Array,    # (F, E), (E,)
    *,
    ff_block_l: int = 256,
    gelu: str = "erf",
    vmem_limit_mb: int = 120,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused pre-LN FF half → x + W2·gelu(W1·LN(x)+b1)+b2."""
    B, L, E = x.shape
    if not interpret and E % 128:
        raise ValueError(f"ff_residual_block needs E % 128 == 0 (E={E})")
    ff_block_l = min(ff_block_l, L)
    while L % ff_block_l:
        ff_block_l //= 2
    f32 = lambda z: jnp.asarray(z, jnp.float32)
    return _ff_block(
        x, f32(ls2), f32(lb2), w1.astype(x.dtype), f32(b1),
        w2.astype(x.dtype), f32(b2), ff_block_l, gelu, vmem_limit_mb,
        interpret,
    )


def esm2_layer_block(
    x: jax.Array,
    padneg: jax.Array,
    w3, b3, wo, bo, ls1, lb1, ls2, lb2, w1, b1, w2, b2,
    *,
    heads: int,
    ff_block_l: int = 256,
    gelu: str = "erf",
    vmem_limit_mb: int = 120,
    interpret: bool = False,
    dqkv_dtype=jnp.float32,
) -> jax.Array:
    """Full ESM2Layer = attention half ∘ FF half (two fused VJP ops).

    ``dqkv_dtype=jnp.bfloat16`` halves the backward's dqkv scratch
    (−8 MB at full ESM2-650M size) — the VMEM fallback knob, forwarded to
    the attention half."""
    xa = esm2_attn_block(
        x, padneg, w3, b3, wo, bo, ls1, lb1, heads=heads,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
        dqkv_dtype=dqkv_dtype,
    )
    return ff_residual_block(
        xa, ls2, lb2, w1, b1, w2, b2, ff_block_l=ff_block_l, gelu=gelu,
        vmem_limit_mb=vmem_limit_mb, interpret=interpret,
    )
