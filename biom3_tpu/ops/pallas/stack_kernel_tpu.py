"""Whole-stack fused ProteoScribe kernel (Pallas TPU).

One ``pallas_call`` runs the FULL serving forward for the sampling hot loop
(ref ``Stage3_source/sampling_analysis.py:204-265``): token+axial embedding,
all ``depth`` transformer layers (local-window + linear attention, FF), and
the final norm + output head at the k positions being decoded this step.

Motivation (measured, see tools/profile_sampler.py): the two-kernels-per-
layer path costs ~0.8 ms/layer while pure matmul time is ~0.45 ms — the gap
is per-call overhead and the residual stream round-tripping HBM between
kernels (2×32 MB per layer at B=32).  Here the residual stream h lives in a
VMEM scratch for the whole stack and ONLY the per-layer weights stream from
HBM:

  grid = (B/rows, depth)      # layer index innermost
  * per-layer weights are stacked host-side as (depth, …) arrays whose
    BlockSpec index_map selects layer l — Pallas pipelines the DMAs;
  * h (rows, L, d) persists in scratch across the layer steps of a group;
  * at l == 0 the kernel embeds the int tokens in-VMEM (one-hot matmul +
    positional table) — the (B, L, d) embedded activations never touch HBM;
  * at l == depth-1 it gathers the k decode positions (one-hot matmul),
    applies the final LayerNorm + Linear(→C) and writes ONLY the (rows, k, C)
    logits — the full hidden grid never leaves the chip.

HBM traffic per model call drops from ~2.1 GB (B=32) to
``B/rows × depth × ~6 MB`` of weight streaming + a few MB of I/O.

Layer math is identical to ``ops/pallas/fused_layer_tpu`` (verified against
the Flax graph in tests/test_stack_kernel.py): pre-norm, bias-free q/k/v,
local heads first with ±1-window joint softmax (f32), linear attention with
feature/sequence softmaxes, exact GELU FF.  bf16 MXU inputs, f32
accumulation/softmax throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.pallas.fused_layer_tpu import _gelu, _layernorm
from biom3_tpu.ops.pallas.quant import quant_cols, quant_rows


def _qcols(x, staticq=False):
    """``quant_cols`` with an optional static-scale ablation: ``staticq``
    skips the per-column amax reduction and uses a fixed scale (WRONG math
    — saturates/undersaturates arbitrarily; timing-only, for on-chip
    decomposition of the dynamic-quant VPU cost via ``ablate='staticq'``)."""
    if staticq:
        q = jnp.clip(jnp.round(x * (127.0 / 8.0)), -127.0, 127.0
                     ).astype(jnp.int8)
        return q, jnp.full((1, x.shape[1]), 8.0 / 127.0, jnp.float32)
    return quant_cols(x)


def _attn_core_t(xnt, wqt, wkt, wvt, sq, sk, sv, *, nl, ng, Dh, W, nw, L,
                 scale, precision, cdtype, proj_quant, softmax_opt=False,
                 staticq=False, ablate="", local_impl="strips",
                 attn_quant="none"):
    """Shared d-major attention core of both stream layouts: LN'd (d, L)
    activations → (d, L) concatenated [local-window | linear-attention]
    head outputs (lucidrains semantics: ±1-window strips with joint
    softmax; feature-softmax(q)·seq-softmax(k)ᵀv for the global heads).
    ``proj_quant='int8'``: q/k/v on the int8 MXU path; dots/softmaxes
    stay bf16/f32.
    ``softmax_opt``: the caller pre-folded ``scale·log2(e)`` into the
    LOCAL-head q out-channels (weights or int8 dequant scales), so the
    local softmax is ``exp2(dots − m)`` with a reciprocal-mul normalize —
    two fewer full VPU passes over the (nl, W, 3W) dot strips.  Math is
    exp((q·k)·scale − m·ln2·…) ≡ the unfolded softmax exactly (the fold
    commutes through max-subtraction); global heads are untouched (their
    softmax reads raw q, so their channels are never pre-scaled)."""
    if proj_quant == "int8":
        qxnt, axn = _qcols(xnt, staticq)                    # (d, L), (1, L)

        def projt(wt, s):
            return (jax.lax.dot_general(
                wt, qxnt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * s[:, None] * axn).astype(cdtype)
    else:
        def projt(wt, s):
            return jax.lax.dot_general(
                wt, xnt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype)

    if "noqkv" in ablate:
        # timing-only: drop the three input projections (reuse the LN'd
        # activations), isolating the dots/softmax cost
        qt = kt = vt = xnt
    else:
        qt, kt, vt = projt(wqt, sq), projt(wkt, sk), projt(wvt, sv)

    if "nolocal" in ablate:
        local_t = qt[:nl * Dh, :]                     # timing-only passthrough
        lin_t = (qt[nl * Dh:, :] if "noglobal" in ablate else
                 _attn_global_t(qt, kt, vt, nl=nl, ng=ng, Dh=Dh, L=L,
                                scale=scale, precision=precision,
                                cdtype=cdtype))
        return jnp.concatenate([local_t, lin_t], axis=0)

    qtl = qt[:nl * Dh, :].reshape(nl, Dh, L)
    ktl = kt[:nl * Dh, :].reshape(nl, Dh, L)
    vtl = vt[:nl * Dh, :].reshape(nl, Dh, L)

    aq8 = None
    if attn_quant == "int8":
        # Local-window dots + pv on the int8 MXU (v5e int8 peak ≈ 2× bf16;
        # the K=Dh=32 qk contraction caps bf16 at ~25% utilization, so the
        # MXU time here halves while the dequants ride existing VPU
        # passes).  Scale placement makes every dequant exact-factorable:
        # q/k per (head, token) over Dh — their scales leave the Dh-sum as
        # a rank-1 outer product multiplied into the softmax input; v per
        # (head, channel) over L and p per (head, query) — both factor out
        # of the band-sum.  Global heads stay bf16 (their matmuls are
        # tiny; softmax VPU dominates there).  With softmax_opt the
        # scale·log2e fold arrives pre-applied in q and rides the
        # requantization unchanged.
        def _q_ht(x):                    # (nl, Dh, L) → int8 + (nl, 1, L)
            xf = x.astype(jnp.float32)
            amax = jnp.maximum(jnp.max(jnp.abs(xf), 1, keepdims=True), 1e-6)
            qv = jnp.clip(jnp.round(xf * (127.0 / amax)),
                          -127.0, 127.0).astype(jnp.int8)
            return qv, amax * (1.0 / 127.0)

        vf = vtl.astype(jnp.float32)
        vamax = jnp.maximum(jnp.max(jnp.abs(vf), 2, keepdims=True), 1e-6)
        aq8 = (*_q_ht(qtl), *_q_ht(ktl),
               jnp.clip(jnp.round(vf * (127.0 / vamax)), -127.0,
                        127.0).astype(jnp.int8), vamax * (1.0 / 127.0))

    def _strip(w):
        """One window's (nl·Dh, W) local-head output via the short
        ±1-window strip (edge windows read a 2W band — no padding, no
        masks; lucidrains semantics, local_attention.py:104-149)."""
        lo = max(0, (w - 1) * W)
        hi = min(L, (w + 2) * W)
        if aq8 is not None:
            qq, sqt, kq, skt, vq, svt = aq8
            dots = (jax.lax.dot_general(
                qq[:, :, w * W:(w + 1) * W], kq[:, :, lo:hi],
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
                * sqt[:, 0, w * W:(w + 1) * W][:, :, None]
                * skt[:, 0, lo:hi][:, None, :])
        else:
            qw = qtl[:, :, w * W:(w + 1) * W]
            kn = ktl[:, :, lo:hi]
            dots = jax.lax.dot_general(
                qw, kn, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )
        if softmax_opt:
            # q pre-folded by scale·log2e: dots are already in the log2
            # domain — no scale pass, hardware exp2, reciprocal-mul
            m = jnp.max(dots, axis=-1, keepdims=True)
            e = jnp.exp2(dots - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        else:
            dots = dots * scale
            m = jnp.max(dots, axis=-1, keepdims=True)
            e = jnp.exp(dots - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        if aq8 is not None:
            # p ∈ [0, 1]: per (head, query) amax quant, scale folds out of
            # the band-sum; v was quantized per (head, channel) above
            pamax = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-6)
            pq = jnp.round(p * (127.0 / pamax)).astype(jnp.int8)
            avt = (jax.lax.dot_general(
                vq[:, :, lo:hi], pq, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
                * svt * (pamax[:, :, 0][:, None, :] * (1.0 / 127.0))
            ).astype(cdtype)
        else:
            avt = jax.lax.dot_general(
                vtl[:, :, lo:hi], p.astype(cdtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype)
        return avt.reshape(nl * Dh, W)

    if local_impl.startswith("bandmid") and nw >= 3:
        # Middle ground between "strips" (nw·2 small matmuls per layer,
        # works everywhere) and "banded" (one batched matmul, crashes the
        # remote Mosaic compiler — BACKLOG r3s5): batch only the MIDDLE
        # windows (w=1..nw-2), whose 3W bands are pure contiguous slices —
        # no zero-padding, no -1e9 iota masks, none of the forms the
        # banded repro implicates.  Edge windows keep the 2W strips.
        nmid = nw - 2
        qb = jnp.concatenate(
            [qtl[:, :, w * W:(w + 1) * W] for w in range(1, nw - 1)],
            axis=0)                                      # (nmid·nl, Dh, W)
        kb = jnp.concatenate(
            [ktl[:, :, (w - 1) * W:(w + 2) * W] for w in range(1, nw - 1)],
            axis=0)                                      # (nmid·nl, Dh, 3W)
        vb = jnp.concatenate(
            [vtl[:, :, (w - 1) * W:(w + 2) * W] for w in range(1, nw - 1)],
            axis=0)
        # chunk the batch axis (Mosaic batch>32 matmul→softmax→matmul
        # chains SIGABRT — repro batch64_softmax); "bandmid<N>" overrides
        bmax = int(local_impl[7:]) if len(local_impl) > 7 else 16
        avs = []
        for c0 in range(0, nmid * nl, bmax):
            c1 = min(c0 + bmax, nmid * nl)
            dots = jax.lax.dot_general(
                qb[c0:c1], kb[c0:c1], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                            # (bc, W, 3W)
            if not softmax_opt:
                dots = dots * scale
            m = jnp.max(dots, axis=-1, keepdims=True)
            e = jnp.exp2(dots - m) if softmax_opt else jnp.exp(dots - m)
            p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                 ).astype(cdtype)
            avs.append(jax.lax.dot_general(
                vb[c0:c1], p, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype))                            # (bc, Dh, W)
        avt = jnp.concatenate(avs, axis=0)               # (nmid·nl, Dh, W)
        local_t = jnp.concatenate(
            [_strip(0)]
            + [avt[i * nl:(i + 1) * nl].reshape(nl * Dh, W)
               for i in range(nmid)]
            + [_strip(nw - 1)], axis=1)
    elif local_impl.startswith("banded"):
        # ONE batched matmul over all (head, window) strips instead of a
        # Python loop of nw small matmuls: stack the per-window q slices
        # to (nl, nw, Dh, W) and the overlapping ±1-window k/v bands to
        # (nl, nw, Dh, 3W) (edge windows zero-padded + additively masked,
        # identical math to the short edge strips: exp(-1e9−m) underflows
        # to exactly 0 in both exp and exp2 domains).  Fewer, larger MXU
        # dispatches; one softmax over the whole (nl, nw, W, 3W) block.
        # Mosaic's tpu.matmul supports ONE batch dim — collapse (window,
        # head) to a single nw·nl batch axis, w-major (index = w·nl + h),
        # which both stacks build with plain leading-dim concatenation
        qb = jnp.concatenate(
            [qtl[:, :, w * W:(w + 1) * W] for w in range(nw)], axis=0
        )                                                # (nw·nl, Dh, W)

        def band(xtl):
            strips = []
            for w in range(nw):
                lo, hi = (w - 1) * W, (w + 2) * W
                if w == 0:
                    s = jnp.concatenate(
                        [jnp.zeros((nl, Dh, W), xtl.dtype),
                         xtl[:, :, :2 * W]], axis=2)
                elif w == nw - 1:
                    s = jnp.concatenate(
                        [xtl[:, :, lo:],
                         jnp.zeros((nl, Dh, W), xtl.dtype)], axis=2)
                else:
                    s = xtl[:, :, lo:hi]
                strips.append(s)
            return jnp.concatenate(strips, axis=0)       # (nw·nl, Dh, 3W)

        kband, vband = band(ktl), band(vtl)
        # the remote Mosaic compiler crashes on batch>32 matmul→softmax→
        # matmul chains (repro'd 2026-08-19: batch-64 qk+softmax+pv dies,
        # batch-32 compiles — tools/repro_compiler_crashes.py) — chunk the
        # nw·nl batch axis (local_impl="banded<N>" overrides the default 32)
        bmax = int(local_impl[6:]) if len(local_impl) > 6 else 32
        avs = []
        for c0 in range(0, nw * nl, bmax):
            c1 = min(c0 + bmax, nw * nl)
            dots = jax.lax.dot_general(
                qb[c0:c1], kband[c0:c1], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )                                            # (bc, W, 3W)
            kpos = jax.lax.broadcasted_iota(
                jnp.int32, (c1 - c0, W, 3 * W), 2)
            wid = (jax.lax.broadcasted_iota(
                jnp.int32, (c1 - c0, W, 3 * W), 0) + c0) // nl
            neg = jnp.where(
                ((wid == 0) & (kpos < W))
                | ((wid == nw - 1) & (kpos >= 2 * W)),
                -1e9, 0.0).astype(jnp.float32)
            dots = dots + neg
            if not softmax_opt:
                dots = dots * scale
            m = jnp.max(dots, axis=-1, keepdims=True)
            e = jnp.exp2(dots - m) if softmax_opt else jnp.exp(dots - m)
            p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                 ).astype(cdtype)
            avs.append(jax.lax.dot_general(
                vband[c0:c1], p, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype))                            # (bc, Dh, W)
        avt = jnp.concatenate(avs, axis=0)               # (nw·nl, Dh, W)
        local_t = jnp.concatenate(
            [avt[w * nl:(w + 1) * nl].reshape(nl * Dh, W)
             for w in range(nw)], axis=1)
    else:
        local_t = jnp.concatenate([_strip(w) for w in range(nw)], axis=1)

    if "noglobal" in ablate:
        lin_t = qt[nl * Dh:, :]                       # timing-only passthrough
        return jnp.concatenate([local_t, lin_t], axis=0)
    return jnp.concatenate(
        [local_t, _attn_global_t(qt, kt, vt, nl=nl, ng=ng, Dh=Dh, L=L,
                                 scale=scale, precision=precision,
                                 cdtype=cdtype)], axis=0)


def _attn_global_t(qt, kt, vt, *, nl, ng, Dh, L, scale, precision, cdtype):
    """Linear-attention (global) heads of the d-major core:
    feature-softmax(q)·seq-softmax(k)ᵀv (lucidrains semantics), returning
    the (ng·Dh, L) head outputs."""
    qtg = qt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    ktg = kt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    vtg = vt[nl * Dh:, :].reshape(ng, Dh, L)
    qf = (jax.nn.softmax(qtg, axis=1) * scale).astype(cdtype)
    kf = jax.nn.softmax(ktg, axis=2).astype(cdtype)
    ctx = jax.lax.dot_general(
        kf, vtg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)
    lin_t = jax.lax.dot_general(
        ctx, qf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)
    return lin_t.reshape(ng * Dh, L)


def _attn_body(xb, ls, lb, wqt, wkt, wvt, wot, bo, sq, sk, sv, so, *,
               local_heads, heads, window, precision, cdtype, proj_quant,
               softmax_opt=False):
    """xb: (L, d) residual+bias → attention output + residual (f32 math as
    fused_layer_tpu._attn_kernel; operates on one row).
    ``proj_quant='int8'``: q/k/v/out projections on the int8 MXU path
    (dynamic per-token activation quant × per-out-channel int8 weights);
    attention dots/softmaxes stay bf16/f32."""
    L, d = xb.shape
    Dh = d // heads
    nw = L // window
    nl, ng = local_heads, heads - local_heads
    W = window
    scale = Dh ** -0.5

    xnt = _layernorm(xb, ls, lb).astype(cdtype).T           # (d, L)
    attnt = _attn_core_t(
        xnt, wqt, wkt, wvt, sq, sk, sv, nl=nl, ng=ng, Dh=Dh, W=W, nw=nw,
        L=L, scale=scale, precision=precision, cdtype=cdtype,
        proj_quant=proj_quant, softmax_opt=softmax_opt,
    )
    if proj_quant == "int8":
        qattn, aat = quant_cols(attnt)
        outt = jax.lax.dot_general(               # (L, d): contract d_in
            qattn, wot, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * aat.T * so
        return xb.astype(jnp.float32) + outt + bo.astype(jnp.float32)
    outt = jax.lax.dot_general(
        wot, attnt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    return xb.astype(jnp.float32) + outt.T + bo.astype(jnp.float32)


def _ln_cols(xf, ls, lb, one_pass):
    """LayerNorm over the feature (sublane) axis of a (d, L) f32 block.

    ``one_pass``: E[x²]−mean² variance — mean and mean-of-squares come out
    of ONE read of x (two accumulators), dropping the (x−mean)² re-read
    pass of the textbook form.  f32 cancellation error is ~ε·mean², which
    for LN'd residual streams (near-zero mean) is far below the serving
    path's bf16 activation rounding; the f32 parity path keeps two-pass."""
    if one_pass:
        mean = jnp.mean(xf, axis=0, keepdims=True)
        ms = jnp.mean(xf * xf, axis=0, keepdims=True)
        var = jnp.maximum(ms - mean * mean, 0.0)
    else:
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=0, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)
            * ls[:, None] + lb[:, None])


def _attn_body_dl(xb, ls, lb, wqt, wkt, wvt, wot, bo, sq, sk, sv, so, *,
                  local_heads, heads, window, precision, cdtype, proj_quant,
                  softmax_opt=False, ln_onepass=False, staticq=False,
                  ablate="", local_impl="strips", attn_quant="none"):
    """Transposed-stream variant: xb is (d, L) and stays (d, L) — the two
    per-layer activation transposes of ``_attn_body`` (``xnt = ….T`` and
    ``outt.T``) vanish; every matmul already consumes/produces the
    d-major layout.  Math identical (f32 softmax/accum)."""
    d, L = xb.shape
    Dh = d // heads
    nw = L // window
    nl, ng = local_heads, heads - local_heads
    W = window
    scale = Dh ** -0.5

    # LayerNorm over the feature axis = sublane axis in (d, L)
    xnt = _ln_cols(xb.astype(jnp.float32), ls, lb, ln_onepass).astype(cdtype)
    attnt = _attn_core_t(
        xnt, wqt, wkt, wvt, sq, sk, sv, nl=nl, ng=ng, Dh=Dh, W=W, nw=nw,
        L=L, scale=scale, precision=precision, cdtype=cdtype,
        proj_quant=proj_quant, softmax_opt=softmax_opt, staticq=staticq,
        ablate=ablate, local_impl=local_impl, attn_quant=attn_quant,
    )
    if proj_quant == "int8":
        qattn, aat = _qcols(attnt, staticq)
        outt = jax.lax.dot_general(              # (d, L)
            wot, qattn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * so[:, None] * aat
    else:
        outt = jax.lax.dot_general(
            wot, attnt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    return xb.astype(jnp.float32) + outt + bo[:, None].astype(jnp.float32)


def _ff_body_dl(x, ls, lb, w1t, b1, w2t, b2, s1, s2, *, block_l, precision,
                cdtype, gelu, ff_quant, ln_onepass=False, staticq=False):
    """Transposed-stream FF: x (d, L) → x + FFᵀ(LNᵀ(x)); weights arrive
    pre-transposed ((ff, d) and (d, ff)) so both matmuls are d-major.
    ``ff_quant='int8'``: dynamic per-token (column) activation quant ×
    per-out-channel int8 weights, int32 MXU accumulation, fused f32
    dequant (the ops/pallas/quant recipe)."""
    d, L = x.shape
    chunks = []
    for i in range(0, L, block_l):
        xc = x[:, i:i + block_l]
        xn = _ln_cols(xc, ls, lb, ln_onepass)
        if ff_quant == "int8":
            qx, ax = _qcols(xn, staticq)                 # (d, bl), (1, bl)
            h = jax.lax.dot_general(
                w1t, qx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * s1[:, None] * ax + b1.astype(
                jnp.float32
            )[:, None]
            h = _gelu(h, gelu)
            qh, ah = _qcols(h, staticq)
            out = jax.lax.dot_general(
                w2t, qh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * s2[:, None] * ah + b2.astype(
                jnp.float32
            )[:, None]
        else:
            h = jax.lax.dot_general(
                w1t, xn.astype(cdtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + b1.astype(jnp.float32)[:, None]
            h = _gelu(h, gelu).astype(cdtype)
            out = jax.lax.dot_general(
                w2t, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + b2.astype(jnp.float32)[:, None]
        chunks.append(xc + out)
    return jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]


def _ff_body(x, ls, lb, w1, b1, w2, b2, s1, s2, *, block_l, precision, cdtype,
             gelu, ff_quant):
    """x: (L, d) f32 → x + FF(LN(x)), tiled over L to bound the f32 hidden.
    ``ff_quant='int8'``: per-row dynamic activation quant × per-out-channel
    int8 weights on the MXU's int8 path (~2× bf16 issue rate)."""
    L, d = x.shape
    chunks = []
    for i in range(0, L, block_l):
        xc = x[i:i + block_l]
        xn = _layernorm(xc, ls, lb)
        if ff_quant == "int8":
            qx, ax = quant_rows(xn)                      # (bl, d), (bl, 1)
            h = jax.lax.dot_general(
                qx, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ax * s1 + b1.astype(jnp.float32)
            h = _gelu(h, gelu)
            qh, ah = quant_rows(h)
            out = jax.lax.dot_general(
                qh, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ah * s2 + b2.astype(jnp.float32)
        else:
            h = jax.lax.dot_general(
                xn.astype(cdtype), w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + b1.astype(jnp.float32)
            h = _gelu(h, gelu).astype(cdtype)
            out = jax.lax.dot_general(
                h, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + b2.astype(jnp.float32)
        chunks.append(xc + out)
    return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]


def _stack_kernel(
    # inputs (refs), in order:
    ids_ref, pos_ref, bias_ref,
    tok_ref, pemb_ref,
    ls1_ref, lb1_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, bo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    ls2_ref, lb2_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
    fns_ref, fnb_ref, hw_ref, hb_ref,
    # output:
    o_ref,
    # scratch:
    h_ref,
    *, depth, rows, local_heads, heads, window, ff_block_l, precision,
    gelu, ff_quant, proj_quant, softmax_opt, ln_onepass,
):
    l = pl.program_id(1)
    cdtype = h_ref.dtype
    L, d = h_ref.shape[1], h_ref.shape[2]
    C = hw_ref.shape[1]
    k = pos_ref.shape[2]  # pos block is (rows, 1, k) — same as _resident_kernel

    # ---- l == 0: embed tokens + positions straight into VMEM scratch ----
    @pl.when(l == 0)
    def _embed():
        V = tok_ref.shape[0]
        table = tok_ref[:].astype(cdtype)                    # (V, d)
        pemb = pemb_ref[:].astype(cdtype)                    # (L, d)
        for r in range(rows):
            ids = ids_ref[r, 0]                              # (L,) int32
            oh = (
                ids[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (L, V), 1)
            ).astype(cdtype)
            h_ref[r] = jax.lax.dot_general(
                oh, table, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdtype) + pemb

    # ---- one transformer layer on every row in the group ----
    for r in range(rows):
        xb = (
            h_ref[r].astype(jnp.float32)
            + bias_ref[r, 0, 0].astype(jnp.float32)
        )
        xb = _attn_body(
            xb, ls1_ref[0], lb1_ref[0],
            wqt_ref[0], wkt_ref[0], wvt_ref[0], wot_ref[0], bo_ref[0],
            sq_ref[0, 0], sk_ref[0, 0], sv_ref[0, 0], so_ref[0, 0],
            local_heads=local_heads, heads=heads, window=window,
            precision=precision, cdtype=cdtype, proj_quant=proj_quant,
            softmax_opt=softmax_opt,
        )
        xb = _ff_body(
            xb, ls2_ref[0], lb2_ref[0],
            w1_ref[0], b1_ref[0], w2_ref[0], b2_ref[0],
            s1_ref[0, 0], s2_ref[0, 0],
            block_l=ff_block_l, precision=precision, cdtype=cdtype,
            gelu=gelu, ff_quant=ff_quant,
        )
        h_ref[r] = xb.astype(cdtype)

    # ---- l == depth-1: gather decode positions, final norm + head ----
    @pl.when(l == depth - 1)
    def _head():
        for r in range(rows):
            pos = pos_ref[r, 0]                              # (k,) int32
            oh = (
                pos[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (k, L), 1)
            ).astype(cdtype)
            hk = jax.lax.dot_general(                        # (k, d)
                oh, h_ref[r], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hn = _layernorm(hk, fns_ref[0], fnb_ref[0])
            logits = jax.lax.dot_general(
                hn.astype(cdtype), hw_ref[:].astype(cdtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + hb_ref[0].astype(jnp.float32)
            o_ref[r] = logits.astype(o_ref.dtype)


def _resident_kernel(
    ids_ref, pos_ref, bias_ref,
    tok_ref, pemb_ref,
    ls1_ref, lb1_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, bo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    ls2_ref, lb2_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
    fns_ref, fnb_ref, hw_ref, hb_ref,
    o_ref,
    h_ref,
    *, depth, rows, local_heads, heads, window, ff_block_l, precision,
    gelu, ff_quant, proj_quant, softmax_opt, ln_onepass,
):
    """All-weights-resident variant: ONE grid axis (batch groups); the layer
    loop runs inside the kernel (`fori_loop` + dynamic leading-dim indexing
    into the stacked weight refs, which stay in VMEM for the whole call).
    Weight HBM traffic per model call: 96 MB once — not per batch row."""
    cdtype = h_ref.dtype
    L, d = h_ref.shape[1], h_ref.shape[2]
    C = hw_ref.shape[1]
    k = pos_ref.shape[2]
    V = tok_ref.shape[0]

    table = tok_ref[:].astype(cdtype)
    pemb = pemb_ref[:].astype(cdtype)
    for r in range(rows):
        ids = ids_ref[r, 0]
        oh = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (L, V), 1)
        ).astype(cdtype)
        h_ref[r] = jax.lax.dot_general(
            oh, table, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdtype) + pemb

    def layer(l, _):
        for r in range(rows):
            xb = (
                h_ref[r].astype(jnp.float32)
                + bias_ref[r, l, 0].astype(jnp.float32)
            )
            xb = _attn_body(
                xb, ls1_ref[l, 0], lb1_ref[l, 0],
                wqt_ref[l], wkt_ref[l], wvt_ref[l], wot_ref[l], bo_ref[l, 0],
                sq_ref[l, 0], sk_ref[l, 0], sv_ref[l, 0], so_ref[l, 0],
                local_heads=local_heads, heads=heads, window=window,
                precision=precision, cdtype=cdtype, proj_quant=proj_quant,
                softmax_opt=softmax_opt,
            )
            xb = _ff_body(
                xb, ls2_ref[l, 0], lb2_ref[l, 0],
                w1_ref[l], b1_ref[l, 0], w2_ref[l], b2_ref[l, 0],
                s1_ref[l, 0], s2_ref[l, 0],
                block_l=ff_block_l, precision=precision, cdtype=cdtype,
                gelu=gelu, ff_quant=ff_quant,
            )
            h_ref[r] = xb.astype(cdtype)
        return _

    jax.lax.fori_loop(0, depth, layer, None)

    for r in range(rows):
        pos = pos_ref[r, 0]
        oh = (
            pos[:, None] == jax.lax.broadcasted_iota(jnp.int32, (k, L), 1)
        ).astype(cdtype)
        hk = jax.lax.dot_general(
            oh, h_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hn = _layernorm(hk, fns_ref[0], fnb_ref[0])
        logits = jax.lax.dot_general(
            hn.astype(cdtype), hw_ref[:].astype(cdtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + hb_ref[0].astype(jnp.float32)
        o_ref[r] = logits.astype(o_ref.dtype)


def _resident_kernel_dl(
    ids_ref, pos_ref, bias_ref,
    tok_ref, pemb_ref,
    ls1_ref, lb1_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, bo_ref,
    sq_ref, sk_ref, sv_ref, so_ref,
    ls2_ref, lb2_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
    fns_ref, fnb_ref, hw_ref, hb_ref,
    o_ref,
    h_ref,
    *, depth, rows, local_heads, heads, window, ff_block_l, precision,
    gelu, ff_quant, proj_quant, softmax_opt, ln_onepass, ablate="",
    local_impl="strips", attn_quant="none",
):
    """Transposed-stream resident variant: the residual scratch is (rows,
    d, L) and every stage works d-major — no per-layer activation
    transposes.  tok/pos tables and FF weights arrive pre-transposed
    (host-side, loop-invariant).

    ``ablate``: timing-only decomposition knob (WRONG math — never in a
    serving path): "no_attn"/"no_ff" skip that sublayer entirely,
    "staticq" replaces the dynamic per-token activation-quant amax
    reductions with a fixed scale (see ``_qcols``)."""
    staticq = "staticq" in ablate
    cdtype = h_ref.dtype
    d, L = h_ref.shape[1], h_ref.shape[2]
    C = hw_ref.shape[1]
    k = pos_ref.shape[2]
    V = tok_ref.shape[1]                                 # tok_ref: (d, V)

    tablet = tok_ref[:].astype(cdtype)
    pembt = pemb_ref[:].astype(cdtype)                   # (d, L)
    for r in range(rows):
        ids = ids_ref[r, 0]
        oht = (
            jax.lax.broadcasted_iota(jnp.int32, (V, L), 0) == ids[None, :]
        ).astype(cdtype)                                 # (V, L)
        h_ref[r] = jax.lax.dot_general(
            tablet, oht, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdtype) + pembt

    def layer(l, _):
        for r in range(rows):
            xb = (
                h_ref[r].astype(jnp.float32)
                + bias_ref[r, l, 0].astype(jnp.float32)[:, None]
            )
            if "no_attn" not in ablate:
                xb = _attn_body_dl(
                    xb, ls1_ref[l, 0], lb1_ref[l, 0],
                    wqt_ref[l], wkt_ref[l], wvt_ref[l], wot_ref[l],
                    bo_ref[l, 0],
                    sq_ref[l, 0], sk_ref[l, 0], sv_ref[l, 0], so_ref[l, 0],
                    local_heads=local_heads, heads=heads, window=window,
                    precision=precision, cdtype=cdtype,
                    proj_quant=proj_quant, softmax_opt=softmax_opt,
                    ln_onepass=ln_onepass, staticq=staticq, ablate=ablate,
                    local_impl=local_impl, attn_quant=attn_quant,
                )
            if "no_ff" not in ablate:
                xb = _ff_body_dl(
                    xb, ls2_ref[l, 0], lb2_ref[l, 0],
                    w1_ref[l], b1_ref[l, 0], w2_ref[l], b2_ref[l, 0],
                    s1_ref[l, 0], s2_ref[l, 0],
                    block_l=ff_block_l, precision=precision, cdtype=cdtype,
                    gelu=gelu, ff_quant=ff_quant, ln_onepass=ln_onepass,
                    staticq=staticq,
                )
            h_ref[r] = xb.astype(cdtype)
        return _

    jax.lax.fori_loop(0, depth, layer, None)

    for r in range(rows):
        pos = pos_ref[r, 0]
        oh = (
            pos[:, None] == jax.lax.broadcasted_iota(jnp.int32, (k, L), 1)
        ).astype(cdtype)                                 # (k, L)
        # (k, d) orientation: the (d, L)·(k, L)→(d, k) form hits a Mosaic
        # vector.broadcast element-type verification bug on the lane-size-1
        # output; one-hot row-picking is exact in bf16 (h is stored bf16)
        hk = jax.lax.dot_general(                        # (k, d)
            oh, h_ref[r], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hn = _layernorm(hk, fns_ref[0], fnb_ref[0])
        logits = jax.lax.dot_general(                    # (k, C)
            hn.astype(cdtype), hw_ref[:].astype(cdtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) + hb_ref[0].astype(jnp.float32)
        o_ref[r] = logits.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "local_heads", "heads", "window", "rows", "ff_block_l",
        "ff_buffers", "gelu", "vmem_limit_mb", "resident", "stream",
        "interpret", "ff_quant", "proj_quant", "softmax_opt", "ln_onepass",
        "ablate", "local_impl", "attn_quant",
    ),
)
def fused_stack_logits(
    ids: jax.Array,          # (B, L) int32 current tokens
    pos: jax.Array,          # (B, k) int32 positions to decode
    bias: jax.Array,         # (B, depth, d) per-layer additive bias (time+cond)
    tok_table: jax.Array,    # (V, d) token embedding
    pos_emb: jax.Array,      # (L, d) axial positional embedding, pre-summed
    ln1_scale: jax.Array, ln1_bias: jax.Array,     # (depth, d)
    wq: jax.Array, wk: jax.Array, wv: jax.Array,   # (depth, d, d) — layout (d_in, d_out)
    wo: jax.Array, bo: jax.Array,                  # (depth, d, d), (depth, d)
    ln2_scale: jax.Array, ln2_bias: jax.Array,     # (depth, d)
    w1: jax.Array, b1: jax.Array,                  # (depth, d, ff), (depth, ff)
    w2: jax.Array, b2: jax.Array,                  # (depth, ff, d), (depth, d)
    fn_scale: jax.Array, fn_bias: jax.Array,       # (d,)
    head_w: jax.Array, head_b: jax.Array,          # (d, C), (C,)
    s1: jax.Array | None = None,                   # (depth, ff) int8 FF
    s2: jax.Array | None = None,                   # (depth, d) dequant scales
    sq: jax.Array | None = None,                   # (depth, d) int8 proj
    sk: jax.Array | None = None,                   # dequant scales
    sv: jax.Array | None = None,
    so: jax.Array | None = None,
    *,
    local_heads: int,
    heads: int,
    window: int = 128,
    rows: int = 1,
    ff_block_l: int = 256,
    ff_buffers: int = 1,
    gelu: str = "erf",
    vmem_limit_mb: int = 40,
    resident: bool = False,
    stream: str = "ld",
    interpret: bool = False,
    ff_quant: str = "none",
    proj_quant: str = "none",
    softmax_opt: bool = False,
    ln_onepass: bool = False,
    ablate: str = "",
    local_impl: str = "strips",
    attn_quant: str = "none",
) -> jax.Array:
    """Full serving forward → (B, k, C) f32 logits at the decode positions.

    ``rows`` = batch rows per program (VMEM scratch is rows·L·d·2 bytes).
    ``ff_buffers`` = pipeline buffer count for the two FF weight streams
    (2 overlaps their DMA with compute at +4 MB VMEM).
    ``resident=True`` keeps ALL layers' stacked weights in VMEM for the
    whole call (~96 MB at the reference config — fits v5e's 128 MB) and
    loops layers inside the kernel: weight HBM traffic drops from
    B/rows·depth·6 MB to one 96 MB prefetch.  Needs ``vmem_limit_mb``
    ≈ 110+.
    ``stream``: residual-stream layout — "ld" ((L, d), transposes the
    activations around each projection block) or "dl" ((d, L) d-major the
    whole way; resident-only; removes the two per-layer transposes).
    ``softmax_opt``: fold ``head_dim^-0.5·log2(e)`` into the local-head q
    out-channels here (weights, or int8 dequant scales — exact) so the
    local-window softmax runs as ``exp2(dots−m)`` with a reciprocal-mul
    normalize: two fewer VPU passes over the (nl, W, 3W) strips per layer.
    ``ln_onepass``: one-read E[x²]−mean² LayerNorms (dl stream only; the
    ld bodies keep the two-pass form).
    ``ablate``: timing-only decomposition knob for on-chip profiling
    (resident+dl only; WRONG math): "no_attn"/"no_ff" skip that sublayer,
    "staticq" drops the dynamic activation-quant amax reductions.
    """
    if ablate and not (resident and stream == "dl"):
        raise ValueError("ablate is a timing-only knob of the resident dl "
                         f"kernel; got resident={resident} stream={stream!r}")
    if local_impl != "strips" and not (
        (local_impl.startswith("banded")
         and (local_impl == "banded" or local_impl[6:].isdigit()))
        or (local_impl.startswith("bandmid")
            and (local_impl == "bandmid" or local_impl[7:].isdigit()))
    ):
        raise ValueError(f"local_impl must be 'strips', 'banded[<N>]' or "
                         f"'bandmid[<N>]', got {local_impl!r}")
    if attn_quant not in ("none", "int8"):
        raise ValueError(f"attn_quant must be 'none' or 'int8', "
                         f"got {attn_quant!r}")
    if attn_quant == "int8" and not (
        resident and stream == "dl" and local_impl == "strips"
    ):
        raise ValueError("attn_quant='int8' (int8 local-window dots/pv) is "
                         "implemented for the resident dl kernel with "
                         "local_impl='strips'")
    if local_impl != "strips" and not (resident and stream == "dl"):
        raise ValueError("local_impl='banded' is implemented for the "
                         "resident dl kernel")
    B, L = ids.shape
    depth = ln1_scale.shape[0]
    d = tok_table.shape[1]
    ff = w1.shape[2]
    k = pos.shape[1]
    C = head_w.shape[1]
    if B % rows:
        raise ValueError(f"B={B} not divisible by rows={rows}")
    import os as _os

    if (rows >= 2 and stream == "dl" and not interpret
            and not _os.environ.get("BIOM3_ALLOW_COMPILER_KILLERS")):
        # This combination crashed the remote TPU compiler (HTTP 500) on
        # pre-2026-08-19 backends; the 2026-08-19 backend compiles it
        # (tools/repro_compiler_crashes.py --which dl_rows2: PASS), so the
        # hard fence is now a warning.  Re-test per backend change.
        import warnings as _warnings

        _warnings.warn(
            "stream='dl' with rows>=2 crashed pre-2026-08-19 TPU backends "
            "(remote-compile HTTP 500; fixed on the current one).  If the "
            "compile 500s, use stream='ld' or rows=1 and re-test with "
            "tools/repro_compiler_crashes.py --which dl_rows2",
            stacklevel=2,
        )
    if local_heads and L % window:
        raise ValueError(f"L={L} not divisible by window={window} "
                         "(the window loop would drop the tail)")
    if d % heads:
        raise ValueError(f"d={d} not divisible by heads={heads}")
    cdtype = tok_table.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    if ff_quant == "int8":
        if w1.dtype != jnp.int8 or w2.dtype != jnp.int8:
            raise ValueError("ff_quant='int8' needs int8 w1/w2 "
                             "(quantize via ops.pallas.quant)")
        if s1 is None or s2 is None:
            raise ValueError("ff_quant='int8' needs s1/s2 dequant scales")
    else:
        # unused by the kernel when quant is off, but the ref list is fixed
        s1 = jnp.ones((depth, ff), jnp.float32)
        s2 = jnp.ones((depth, d), jnp.float32)
    if proj_quant == "int8":
        if any(w.dtype != jnp.int8 for w in (wq, wk, wv, wo)):
            raise ValueError("proj_quant='int8' needs int8 wq/wk/wv/wo "
                             "(quantize via ops.pallas.quant)")
        if any(s is None for s in (sq, sk, sv, so)):
            raise ValueError("proj_quant='int8' needs sq/sk/sv/so scales")
    else:
        sq = sk = sv = so = jnp.ones((depth, d), jnp.float32)

    if softmax_opt:
        # pre-fold scale·log2e into the LOCAL-head q out-channels so the
        # kernel's local softmax is exp2-domain with no scale pass; global
        # heads softmax raw q, so their channels stay untouched.  On the
        # int8 path the fold rides the f32 dequant scales (bit-exact w.r.t.
        # the quantized weights); on the bf16 path it re-rounds wq once
        # (≤1 ulp, same order as the bf16 weights themselves).  Loop-
        # invariant under sampling scans — XLA hoists it with the
        # transposes below.
        nlc = local_heads * (d // heads)
        fold = (d // heads) ** -0.5 * 1.4426950408889634     # scale·log2e
        mask = (jnp.arange(d) < nlc)[None, :]                # (1, d_out)
        if proj_quant == "int8":
            sq = jnp.where(mask, sq * fold, sq)
        else:
            wq = jnp.where(mask, wq * fold, wq)  # broadcasts over (depth, d_in)

    single = pl.Buffered(buffer_count=1)
    ffmode = pl.Buffered(buffer_count=ff_buffers)

    if resident:
        # one grid axis (batch groups); every weight array is a whole-array
        # constant block that stays in VMEM across the in-kernel layer loop
        def lyr(r, c, mode=None):
            return pl.BlockSpec(
                (depth, r, c), lambda g: (0, 0, 0), memory_space=pltpu.VMEM,
                pipeline_mode=single,
            )

        def cst(r, c):
            return pl.BlockSpec(
                (r, c), lambda g: (0, 0), memory_space=pltpu.VMEM,
                pipeline_mode=single,
            )

        grid = (B // rows,)
        grp3 = lambda m, n: pl.BlockSpec(
            (rows, m, n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM,
        )
        io_specs = dict(
            ids_spec=grp3(1, L),
            pos_spec=grp3(1, k),
            bias_spec=pl.BlockSpec(
                (rows, depth, 1, d), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_spec=pl.BlockSpec(
                (rows, k, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM,
            ),
        )
        kernel = functools.partial(
            _resident_kernel_dl if stream == "dl" else _resident_kernel,
            depth=depth, rows=rows,
            local_heads=local_heads, heads=heads, window=window,
            ff_block_l=ff_block_l, precision=precision, gelu=gelu,
            ff_quant=ff_quant, proj_quant=proj_quant,
            softmax_opt=softmax_opt, ln_onepass=ln_onepass,
            **({"ablate": ablate, "local_impl": local_impl,
                "attn_quant": attn_quant}
               if stream == "dl" else {}),
        )
    else:
        def lyr(r, c, mode=None):    # (1, r, c) block at layer l
            return pl.BlockSpec(
                (1, r, c), lambda g, l: (l, 0, 0), memory_space=pltpu.VMEM,
                **({"pipeline_mode": mode} if mode is not None else {}),
            )

        def cst(r, c):               # whole-array constant
            return pl.BlockSpec(
                (r, c), lambda g, l: (0, 0), memory_space=pltpu.VMEM,
                pipeline_mode=single,
            )

        grid = (B // rows, depth)
        io_specs = dict(
            ids_spec=pl.BlockSpec((rows, 1, L), lambda g, l: (g, 0, 0),
                                  memory_space=pltpu.VMEM),
            pos_spec=pl.BlockSpec((rows, 1, k), lambda g, l: (g, 0, 0),
                                  memory_space=pltpu.VMEM),
            bias_spec=pl.BlockSpec((rows, 1, 1, d), lambda g, l: (g, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_spec=pl.BlockSpec((rows, k, C), lambda g, l: (g, 0, 0),
                                  memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(
            _stack_kernel, depth=depth, rows=rows, local_heads=local_heads,
            heads=heads, window=window, ff_block_l=ff_block_l,
            precision=precision, gelu=gelu, ff_quant=ff_quant,
            proj_quant=proj_quant,
            softmax_opt=softmax_opt, ln_onepass=ln_onepass,
        )
    if stream == "dl":
        # d-major residual stream: tok/pos tables + FF weights transposed
        # host-side (loop-invariant under sampling scans), scratch (rows,d,L)
        if not resident:
            raise ValueError("stream='dl' is implemented for resident=True")
        tok_in, pemb_in = tok_table.T, pos_emb.T          # (d,V), (d,L)
        w1_in, w2_in = jnp.swapaxes(w1, 1, 2), jnp.swapaxes(w2, 1, 2)
        tok_spec, pemb_spec = cst(d, tok_table.shape[0]), cst(d, L)
        w1_spec, w2_spec = lyr(ff, d, ffmode), lyr(d, ff, ffmode)
        scratch = pltpu.VMEM((rows, d, L), cdtype)
    elif stream == "ld":
        tok_in, pemb_in = tok_table, pos_emb
        w1_in, w2_in = w1, w2
        tok_spec, pemb_spec = cst(tok_table.shape[0], d), cst(L, d)
        w1_spec, w2_spec = lyr(d, ff, ffmode), lyr(ff, d, ffmode)
        scratch = pltpu.VMEM((rows, L, d), cdtype)
    else:
        raise ValueError(f"unknown stream layout {stream!r}")

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # ids/pos/bias carry singleton dims so the trailing two block
            # dims equal the array dims (Mosaic block-shape rule)
            io_specs["ids_spec"],                             # ids (B,1,L)
            io_specs["pos_spec"],                             # pos (B,1,k)
            io_specs["bias_spec"],                            # bias (B,depth,1,d)
            tok_spec,                                         # tok table
            pemb_spec,                                        # pos emb
            lyr(1, d), lyr(1, d),                             # ln1 s/b
            lyr(d, d), lyr(d, d), lyr(d, d),                  # wqᵀ wkᵀ wvᵀ
            lyr(d, d), lyr(1, d),                             # woᵀ bo
            lyr(1, d), lyr(1, d),                             # sq sk
            lyr(1, d), lyr(1, d),                             # sv so
            lyr(1, d), lyr(1, d),                             # ln2 s/b
            w1_spec, lyr(1, ff),                              # w1 b1
            w2_spec, lyr(1, d),                               # w2 b2
            lyr(1, ff), lyr(1, d),                            # s1 s2
            cst(1, d), cst(1, d),                             # final norm s/b
            cst(d, C), cst(1, C),                             # head w/b
        ],
        out_specs=io_specs["out_spec"],
        out_shape=jax.ShapeDtypeStruct((B, k, C), jnp.float32),
        scratch_shapes=[scratch],
        # the residual stream + streamed weights + f32 working set exceed
        # XLA's conservative 16 MB scoped-vmem default; v5e/v6e have far
        # more physical VMEM (128 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        ids[:, None, :], pos[:, None, :],
        bias[:, :, None, :].astype(cdtype),
        tok_in, pemb_in,
        ln1_scale[:, None, :], ln1_bias[:, None, :],
        # weights pre-transposed to (d_out-major) for the in-kernel
        # transposed-activation matmuls; host-side, hoisted out of scans
        jnp.swapaxes(wq, 1, 2), jnp.swapaxes(wk, 1, 2), jnp.swapaxes(wv, 1, 2),
        jnp.swapaxes(wo, 1, 2), bo[:, None, :],
        sq[:, None, :], sk[:, None, :], sv[:, None, :], so[:, None, :],
        ln2_scale[:, None, :], ln2_bias[:, None, :],
        w1_in, b1[:, None, :], w2_in, b2[:, None, :],
        s1[:, None, :], s2[:, None, :],
        fn_scale[None, :], fn_bias[None, :],
        head_w, head_b[None, :],
    )
