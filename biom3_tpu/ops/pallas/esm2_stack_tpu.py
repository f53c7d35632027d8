"""Whole-tower fused ESM2 kernel with streamed weights (Pallas TPU).

One ``pallas_call`` runs the FULL ESM2 protein-tower forward for Stage-1
serving (ref tower: ``Stage1_source/model.py:59-76`` — CLS of repr layer 33):
token embedding (+fair-esm token-dropout rescale), all ``depth`` pre-norm
rotary-attention transformer layers, the final ``emb_layer_norm_after``, and
emits ONLY the (B, E) CLS vectors.

Design (the ``stack_kernel_tpu`` template at ESM2-650M scale — 650M params
can't sit VMEM-resident, so the *residual stream* is resident and the
*weights* stream):

  grid = (B/rows, depth)            # layer index innermost
  * the residual h (rows, L, E) lives in VMEM scratch across all layer
    steps of a group — activations never touch HBM between layers;
  * per-layer weights are stacked host-side as (depth, …) arrays whose
    BlockSpec index_map selects layer l — Pallas double-buffers the DMAs
    (~39 MB/layer streamed against ~0.5 ms/layer of matmul);
  * at l == 0 the kernel embeds tokens in-VMEM (one-hot matmul + fair-esm
    token-dropout ×(1−0.12)/(1−mask_ratio) rescale + pad/mask zeroing);
  * at l == depth−1 it LayerNorms the CLS row and writes (rows, 1, E).

Per-layer math matches ``models/esm2.ESM2Layer`` exactly (verified in
tests/test_esm2_stack.py): pre-LN (eps 1e-5), fused-qkv projection with
bias, GPT-NeoX rotary over the full head dim (rotate_half as a ±1
permutation matmul — MXU, bit-exact; see ops/rotary._rotate_half_mxu), f32
softmax with key-padding mask derived from ``tokens == pad_idx`` (SURVEY
Q3), out-proj + residual, pre-LN FF (E→4E GELU→E) + residual.  Head slicing
happens on the SUBLANE axis (q/k/v kept transposed (E, L)) — lane-axis head
slicing would relayout on every access.

bf16 inputs run the serving fast path (bf16 MXU, f32 accumulation/softmax);
f32 inputs run HIGHEST-precision (parity twin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.pallas.fused_layer_tpu import _gelu, _layernorm
from biom3_tpu.ops.pallas.quant import (  # noqa: F401 — re-exported API
    quant_cols as _quant_cols,
    quant_rows as _quant_rows,
    quantize_weight_int8,
)

NEG_INF = -1e9


def _esm2_stack_kernel(
    # inputs (refs), in order:
    ids_ref,                                     # (rows, 1, L) i32
    tok_ref,                                     # (V, E) embedding table
    cost_ref, sint_ref, pt_ref,                  # (Dh, L), (Dh, L), (Dh, Dh)
    ls1_ref, lb1_ref,                            # (1, 1, E) attn LN
    wqt_ref, wkt_ref, wvt_ref,                   # (1, E, E) pre-transposed
    bq_ref, bk_ref, bv_ref,                      # (1, 1, E)
    wo_ref, bo_ref,                              # (1, E, E) (in,out), (1, 1, E)
    sq_ref, sk_ref, sv_ref, so_ref,              # (1, 1, E) proj dequant
    #   scales (ones when proj_quant == "none")
    ls2_ref, lb2_ref,                            # (1, 1, E) final LN (pre-FF)
    w1_ref, b1_ref,                              # (1, E, F), (1, 1, F)
    w2_ref, b2_ref,                              # (1, F, E), (1, 1, E)
    s1_ref, s2_ref,                              # (1, 1, F), (1, 1, E) int8
    #   per-out-channel dequant scales (ones when ff_quant == "none")
    fns_ref, fnb_ref,                            # (1, E) emb_layer_norm_after
    # output:
    o_ref,                                       # (rows, 1, E) f32 CLS
    # scratch:
    h_ref,                                       # (rows, L, E) cdtype
    attn_ref,                                    # (E, L) cdtype
    qkv_ref,                                     # (3E, L) cdtype
    xres_ref,                                    # (L, E) f32
    *, depth, rows, heads, ff_block_l, precision, gelu,
    pad_idx, mask_idx, token_dropout, head_unroll, ff_quant, proj_quant,
    softmax_opt, ln_onepass, ablate="",
):
    l = pl.program_id(1)
    cdtype = h_ref.dtype
    L, E = h_ref.shape[1], h_ref.shape[2]
    V = tok_ref.shape[0]
    Dh = E // heads
    scale = Dh ** -0.5

    # ---- l == 0: embed tokens straight into the VMEM residual ----
    @pl.when(l == 0)
    def _embed():
        table = tok_ref[:].astype(cdtype)
        for r in range(rows):
            ids = ids_ref[r, 0]                                  # (L,) i32
            oh = (
                ids[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (L, V), 1)
            ).astype(jnp.float32)                                # (L, V)
            x = jax.lax.dot_general(
                oh.astype(cdtype), table, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # (L, E) f32
            is_pad = oh[:, pad_idx:pad_idx + 1]                  # (L, 1)
            if token_dropout:
                # fair-esm: zero <mask> embeddings, rescale by
                # (1-0.12)/(1-observed mask ratio) (models/esm2.py:130-137)
                is_mask = oh[:, mask_idx:mask_idx + 1]
                n_mask = jnp.sum(is_mask)
                n_tok = jnp.maximum(1.0, jnp.sum(1.0 - is_pad))
                x = x * (1.0 - is_mask)
                x = x * (0.88 / (1.0 - n_mask / n_tok))
            x = x * (1.0 - is_pad)                               # Q3 pad zero
            h_ref[r] = x.astype(cdtype)

    # ---- one transformer layer on every row of the group ----
    for r in range(rows):
        ids2d = ids_ref[r]                                       # (1, L) i32
        padneg = jnp.where(ids2d == pad_idx, NEG_INF, 0.0)       # (1, L) f32

        xres_ref[:] = h_ref[r].astype(jnp.float32)               # (L, E)
        xnt = _layernorm(
            xres_ref[:], ls1_ref[0, 0], lb1_ref[0, 0], eps=1e-5,
            one_pass=ln_onepass,
        ).astype(cdtype).T                                       # (E, L)

        if proj_quant == "int8":
            qxnt, axn = _quant_cols(xnt)

        def projt(dst, wt_ref, b_ref, s_ref):
            # (E, L) = Wᵀ (E,E) @ xnt + bᵀ; staged into the qkv scratch so
            # the head fori_loop can dynamic-slice a ref (Mosaic cannot
            # dynamic_slice values)
            if proj_quant == "int8":
                out = jax.lax.dot_general(
                    wt_ref[0], qxnt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * s_ref[0, 0][:, None] * axn
            else:
                out = jax.lax.dot_general(
                    wt_ref[0].astype(cdtype), xnt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            qkv_ref[dst * E:(dst + 1) * E, :] = (
                out + b_ref[0, 0].astype(jnp.float32)[:, None]
            ).astype(cdtype)

        projt(0, wqt_ref, bq_ref, sq_ref)
        projt(1, wkt_ref, bk_ref, sk_ref)
        projt(2, wvt_ref, bv_ref, sv_ref)

        cost = cost_ref[:].astype(cdtype)                        # (Dh, L)
        sint = sint_ref[:].astype(cdtype)
        pt = pt_ref[:].astype(cdtype)                            # (Dh, Dh)

        # heads as a fori_loop (NOT a python unroll): per-head f32 score
        # intermediates are 8 MB each — unrolling keeps all `heads` of them
        # live at once and blows the 128 MB VMEM budget; the loop reuses
        # one set of buffers
        def head_body(hd, _):
            off = pl.multiple_of(hd * Dh, Dh)

            def rot(zt):
                # GPT-NeoX rotary, transposed: z·cos + (Pᵀ z)·sin — bit-
                # exact rotate_half as a ±1 permutation matmul (MXU)
                if "no_rot" in ablate:               # timing-only knob
                    return zt
                zp = jax.lax.dot_general(
                    pt, zt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ).astype(cdtype)
                return zt * cost + zp * sint

            qh = rot(qkv_ref[pl.ds(off, Dh), :])
            kh = rot(qkv_ref[pl.ds(E + off, Dh), :])
            vh = qkv_ref[pl.ds(2 * E + off, Dh), :]
            if "no_dots" in ablate:                  # timing-only knob:
                attn_ref[pl.ds(off, Dh), :] = vh     # skip dots+softmax+pv
                return _
            dots = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                    # (Lq, Lk) f32
            if "no_softmax" in ablate:               # timing-only knob
                p = (dots * scale).astype(cdtype)
            elif softmax_opt:
                # scale·log2e pre-folded into wq/bq (rotary is linear in q,
                # so the fold rides through rot()): dots are log2-domain —
                # no scale pass, hardware exp2, reciprocal-mul.  padneg's
                # -1e9 is -inf in either domain.
                dots = dots + padneg
                m = jnp.max(dots, axis=-1, keepdims=True)
                e = jnp.exp2(dots - m)
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(cdtype)
            else:
                dots = dots * scale + padneg                     # mask PAD keys
                m = jnp.max(dots, axis=-1, keepdims=True)
                e = jnp.exp(dots - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
            attn_ref[pl.ds(off, Dh), :] = jax.lax.dot_general(
                vh, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype)                                     # (Dh, Lq)
            return _

        # NOTE Mosaic's for-loop lowering only supports unroll=1 or full
        # unroll (=heads); full unroll keeps every head's 8 MB f32 score
        # buffer live and blows VMEM (measured 237 MB), so 1 is the only
        # usable value at full size — knob kept for small-config experiments
        jax.lax.fori_loop(0, heads, head_body, None, unroll=head_unroll)

        # out projection (kernel (in,out) laid out for the transposed attn):
        # dot_general contracting attn_ref's E axis with Wo's in axis,
        # outputting (L, E) directly avoids transposing the big attn matrix:
        # out[l, o] = Σ_e attn[e, l]·Wo[e, o]
        if proj_quant == "int8":
            qattn, aat = _quant_cols(attn_ref[:])                # (E,L),(1,L)
            out = jax.lax.dot_general(
                qattn, wo_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * aat.T * so_ref[0, 0]         # (L, E) f32
        else:
            out = jax.lax.dot_general(
                attn_ref[:], wo_ref[0].astype(cdtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                    # (L, E) f32
        xres_ref[:] = xres_ref[:] + out + bo_ref[0, 0].astype(jnp.float32)

        # ---- FF block (pre-LN, E→4E GELU→E), tiled over L ----
        # fori_loop for the same VMEM-liveness reason as the head loop
        def ff_body(i, _):
            off = pl.multiple_of(i * ff_block_l, ff_block_l)
            xc = xres_ref[pl.ds(off, ff_block_l), :]
            xn = _layernorm(xc, ls2_ref[0, 0], lb2_ref[0, 0], eps=1e-5,
                            one_pass=ln_onepass)
            if ff_quant == "int8":
                # int8 MXU path (~2x bf16 on v5e): per-row dynamic
                # activation quant x per-out-channel static weight quant,
                # int32 accumulation, f32 dequant (scales fused into one
                # rank-1 rescale per matmul)
                qx, ax = _quant_rows(xn)
                h1 = jax.lax.dot_general(
                    qx, w1_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ax * s1_ref[0, 0] + b1_ref[
                    0, 0
                ].astype(jnp.float32)
                h1 = _gelu(h1, gelu)
                qh, ah = _quant_rows(h1)
                out = jax.lax.dot_general(
                    qh, w2_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ah * s2_ref[0, 0] + b2_ref[
                    0, 0
                ].astype(jnp.float32)
            else:
                h1 = jax.lax.dot_general(
                    xn.astype(cdtype), w1_ref[0].astype(cdtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ) + b1_ref[0, 0].astype(jnp.float32)
                h1 = _gelu(h1, gelu).astype(cdtype)
                out = jax.lax.dot_general(
                    h1, w2_ref[0].astype(cdtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ) + b2_ref[0, 0].astype(jnp.float32)
            h_ref[r, pl.ds(off, ff_block_l)] = (xc + out).astype(cdtype)
            return _

        if "no_ff" in ablate:                        # timing-only knob
            h_ref[r] = xres_ref[:].astype(cdtype)
        else:
            jax.lax.fori_loop(0, L // ff_block_l, ff_body, None)

        # ---- l == depth-1: final LN on the CLS row only ----
        @pl.when(l == depth - 1)
        def _head():
            cls = h_ref[r, 0:1, :].astype(jnp.float32)           # (1, E)
            o_ref[r] = _layernorm(cls, fns_ref[0], fnb_ref[0], eps=1e-5)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "rows", "ff_block_l", "gelu", "vmem_limit_mb",
        "pad_idx", "mask_idx", "token_dropout", "w_buffers", "ff_buffers",
        "head_unroll", "interpret", "ff_quant", "proj_quant",
        "softmax_opt", "ln_onepass", "ablate",
    ),
)
def fused_esm2_cls(
    ids: jax.Array,                  # (B, L) int32 tokens (fair-esm alphabet)
    tok_table: jax.Array,            # (V, E) embedding (cdtype decides path)
    ln1_scale: jax.Array, ln1_bias: jax.Array,   # (depth, E)
    wq: jax.Array, wk: jax.Array, wv: jax.Array, # (depth, E, E) (in, out)
    bq: jax.Array, bk: jax.Array, bv: jax.Array, # (depth, E)
    wo: jax.Array, bo: jax.Array,                # (depth, E, E), (depth, E)
    ln2_scale: jax.Array, ln2_bias: jax.Array,   # (depth, E)
    w1: jax.Array, b1: jax.Array,                # (depth, E, F), (depth, F)
    w2: jax.Array, b2: jax.Array,                # (depth, F, E), (depth, E)
    fn_scale: jax.Array, fn_bias: jax.Array,     # (E,) emb_layer_norm_after
    s1: jax.Array | None = None,                 # (depth, F) int8 FF dequant
    s2: jax.Array | None = None,                 # (depth, E) scales
    sq: jax.Array | None = None,                 # (depth, E) int8 proj
    sk: jax.Array | None = None,                 # dequant scales
    sv: jax.Array | None = None,
    so: jax.Array | None = None,
    *,
    heads: int,
    rows: int = 1,
    ff_block_l: int = 1024,
    gelu: str = "erf",
    vmem_limit_mb: int = 120,
    pad_idx: int = 1,
    mask_idx: int = 32,
    token_dropout: bool = True,
    w_buffers: int = 2,
    ff_buffers: int = 2,
    head_unroll: int = 1,
    interpret: bool = False,
    ff_quant: str = "none",
    proj_quant: str = "none",
    softmax_opt: bool = False,
    ln_onepass: bool = False,
    ablate: str = "",
) -> jax.Array:
    """Full ESM2 tower forward → (B, E) f32 post-final-norm CLS vectors.

    ``ablate``: timing-only decomposition knob (WRONG math — never a
    serving mode): "no_rot"/"no_dots"/"no_softmax"/"no_ff" skip that
    stage; see tools/exp_esm2_stack.py --which ablate.

    ``rows`` = batch rows per program (residual scratch rows·L·E·2 B).
    ``w_buffers``/``ff_buffers`` = pipeline buffer counts for the attention
    and FF weight streams (2 = double-buffered DMA overlap).
    """
    B, L = ids.shape
    depth, E = ln1_scale.shape
    F = w1.shape[2]
    V = tok_table.shape[0]
    Dh = E // heads
    if B % rows:
        raise ValueError(f"B={B} not divisible by rows={rows}")
    # FF tiles must cover L exactly (the fori_loop would silently skip the
    # tail); on-chip A/B at L=1024: 1024 ≥ 512 > 256 (101.1/100.2/96.0
    # seq/s — fewer, larger FF matmuls win; w_buffers=3 rejected by Mosaic)
    ff_block_l = min(ff_block_l, L)
    while L % ff_block_l:
        ff_block_l //= 2
    cdtype = tok_table.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    if ff_quant == "int8":
        if w1.dtype != jnp.int8 or w2.dtype != jnp.int8:
            raise ValueError("ff_quant='int8' needs int8 w1/w2 "
                             "(esm2_stack_arrays(..., ff_quant='int8'))")
        if s1 is None or s2 is None:
            raise ValueError("ff_quant='int8' needs s1/s2 dequant scales")
    else:
        # unused by the kernel when quant is off, but the ref list is fixed
        s1 = jnp.ones((depth, F), jnp.float32)
        s2 = jnp.ones((depth, E), jnp.float32)
    if proj_quant == "int8":
        if any(w.dtype != jnp.int8 for w in (wq, wk, wv, wo)):
            raise ValueError("proj_quant='int8' needs int8 wq/wk/wv/wo "
                             "(esm2_stack_arrays(..., proj_quant='int8'))")
        if any(s is None for s in (sq, sk, sv, so)):
            raise ValueError("proj_quant='int8' needs sq/sk/sv/so scales")
    else:
        sq = sk = sv = so = jnp.ones((depth, E), jnp.float32)

    if softmax_opt:
        # fold head_dim^-0.5·log2e into the q projection (weights or int8
        # dequant scales — exact there) AND its bias, so the kernel's
        # softmax runs exp2 with no scale pass.  Rotary is linear in q, so
        # the fold commutes through rot().  Loop-invariant host-side work.
        fold = (E // heads) ** -0.5 * 1.4426950408889634
        bq = bq * fold
        if proj_quant == "int8":
            sq = sq * fold
        else:
            wq = wq * fold

    # rotary tables, transposed (feature-major to match (E, L) activations)
    inv_freq = 1.0 / (10000 ** (np.arange(0, Dh, 2, dtype=np.float32) / Dh))
    t = np.arange(L, dtype=np.float32)
    freqs = np.concatenate([t[:, None] * inv_freq[None, :]] * 2, axis=-1)
    cost = jnp.asarray(np.cos(freqs).T)                          # (Dh, L)
    sint = jnp.asarray(np.sin(freqs).T)
    # Pᵀ for transposed rotate_half: out[i] = -z[i+h] (i<h), +z[i-h] (i>=h)
    h2 = Dh // 2
    ptm = np.zeros((Dh, Dh), np.float32)
    ptm[np.arange(h2), np.arange(h2) + h2] = -1.0
    ptm[np.arange(h2) + h2, np.arange(h2)] = 1.0
    pt = jnp.asarray(ptm)

    single = pl.Buffered(buffer_count=1)
    wmode = pl.Buffered(buffer_count=w_buffers)
    ffmode = pl.Buffered(buffer_count=ff_buffers)

    def lyr(rdim, cdim, mode):
        return pl.BlockSpec(
            (1, rdim, cdim), lambda g, l: (l, 0, 0), memory_space=pltpu.VMEM,
            pipeline_mode=mode,
        )

    def cst(rdim, cdim):
        return pl.BlockSpec(
            (rdim, cdim), lambda g, l: (0, 0), memory_space=pltpu.VMEM,
            pipeline_mode=single,
        )

    kernel = functools.partial(
        _esm2_stack_kernel,
        depth=depth, rows=rows, heads=heads, ff_block_l=ff_block_l,
        precision=precision, gelu=gelu, pad_idx=pad_idx, mask_idx=mask_idx,
        token_dropout=token_dropout, head_unroll=head_unroll,
        ff_quant=ff_quant, proj_quant=proj_quant,
        softmax_opt=softmax_opt, ln_onepass=ln_onepass, ablate=ablate,
    )

    return pl.pallas_call(
        kernel,
        grid=(B // rows, depth),
        in_specs=[
            pl.BlockSpec((rows, 1, L), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),               # ids
            cst(V, E),                                           # tok table
            cst(Dh, L), cst(Dh, L), cst(Dh, Dh),                 # cosᵀ sinᵀ Pᵀ
            lyr(1, E, single), lyr(1, E, single),                # ln1 s/b
            lyr(E, E, wmode), lyr(E, E, wmode), lyr(E, E, wmode),  # wqᵀwkᵀwvᵀ
            lyr(1, E, single), lyr(1, E, single), lyr(1, E, single),  # bq/bk/bv
            lyr(E, E, wmode), lyr(1, E, single),                 # wo bo
            lyr(1, E, single), lyr(1, E, single),                # sq sk
            lyr(1, E, single), lyr(1, E, single),                # sv so
            lyr(1, E, single), lyr(1, E, single),                # ln2 s/b
            lyr(E, F, ffmode), lyr(1, F, single),                # w1 b1
            lyr(F, E, ffmode), lyr(1, E, single),                # w2 b2
            lyr(1, F, single), lyr(1, E, single),                # s1 s2
            cst(1, E), cst(1, E),                                # final norm
        ],
        out_specs=pl.BlockSpec(
            (rows, 1, E), lambda g, l: (g, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, L, E), cdtype),                    # residual h
            pltpu.VMEM((E, L), cdtype),                          # attn (ᵀ)
            pltpu.VMEM((3 * E, L), cdtype),                      # qᵀ/kᵀ/vᵀ
            pltpu.VMEM((L, E), jnp.float32),                     # x residual
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        ids[:, None, :],
        tok_table,
        cost.astype(cdtype), sint.astype(cdtype), pt.astype(cdtype),
        ln1_scale[:, None, :], ln1_bias[:, None, :],
        # q/k/v kernels pre-transposed (out-major) for the transposed-
        # activation projections; wo stays (in, out) — the out-proj contracts
        # attnᵀ's feature axis directly, no transpose needed
        jnp.swapaxes(wq, 1, 2), jnp.swapaxes(wk, 1, 2), jnp.swapaxes(wv, 1, 2),
        bq[:, None, :], bk[:, None, :], bv[:, None, :],
        wo, bo[:, None, :],
        sq[:, None, :], sk[:, None, :], sv[:, None, :], so[:, None, :],
        ln2_scale[:, None, :], ln2_bias[:, None, :],
        w1, b1[:, None, :], w2, b2[:, None, :],
        s1[:, None, :], s2[:, None, :],
        fn_scale[None, :], fn_bias[None, :],
    )[:, 0, :]


def esm2_stack_arrays(esm_params: dict, num_layers: int, dtype=jnp.bfloat16,
                      ff_quant: str = "none", proj_quant: str = "none"):
    """Flax ESM2 param tree (``params['params']['protein_encoder']`` or the
    tower's own tree) → the stacked/cast arrays ``fused_esm2_cls`` consumes.

    Weight HBM layout is one (depth, …) array per tensor so each grid step's
    BlockSpec selects layer l (contiguous DMA).  ``ff_quant='int8'``
    replaces w1/w2 with per-out-channel int8 + adds s1/s2 dequant scales;
    ``proj_quant='int8'`` does the same for wq/wk/wv/wo (+ sq/sk/sv/so).
    Pass the same flags to ``fused_esm2_cls``."""
    p = esm_params.get("params", esm_params)

    def stack(getter, sdtype=None):
        return jnp.stack(
            [jnp.asarray(getter(p[f"layers_{i}"]), sdtype or dtype)
             for i in range(num_layers)]
        )

    if ff_quant == "int8":
        w1q, s1 = quantize_weight_int8(
            stack(lambda q: q["fc1"]["kernel"], jnp.float32))
        w2q, s2 = quantize_weight_int8(
            stack(lambda q: q["fc2"]["kernel"], jnp.float32))
        ff = dict(w1=w1q, w2=w2q, s1=s1, s2=s2)
    else:
        ff = dict(w1=stack(lambda q: q["fc1"]["kernel"]),
                  w2=stack(lambda q: q["fc2"]["kernel"]))

    if proj_quant == "int8":
        proj = {}
        for name, key in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                          ("o", "out_proj")):
            wq_, s_ = quantize_weight_int8(
                stack(lambda q, key=key: q["self_attn"][key]["kernel"],
                      jnp.float32))
            proj[f"w{name}"] = wq_
            proj[f"s{name}"] = s_
    else:
        proj = dict(
            wq=stack(lambda q: q["self_attn"]["q_proj"]["kernel"]),
            wk=stack(lambda q: q["self_attn"]["k_proj"]["kernel"]),
            wv=stack(lambda q: q["self_attn"]["v_proj"]["kernel"]),
            wo=stack(lambda q: q["self_attn"]["out_proj"]["kernel"]),
        )

    return dict(
        **ff,
        **proj,
        tok_table=jnp.asarray(p["embed_tokens"]["embedding"], dtype),
        ln1_scale=stack(lambda q: q["self_attn_layer_norm"]["scale"]),
        ln1_bias=stack(lambda q: q["self_attn_layer_norm"]["bias"]),
        bq=stack(lambda q: q["self_attn"]["q_proj"]["bias"]),
        bk=stack(lambda q: q["self_attn"]["k_proj"]["bias"]),
        bv=stack(lambda q: q["self_attn"]["v_proj"]["bias"]),
        bo=stack(lambda q: q["self_attn"]["out_proj"]["bias"]),
        ln2_scale=stack(lambda q: q["final_layer_norm"]["scale"]),
        ln2_bias=stack(lambda q: q["final_layer_norm"]["bias"]),
        b1=stack(lambda q: q["fc1"]["bias"]),
        b2=stack(lambda q: q["fc2"]["bias"]),
        fn_scale=jnp.asarray(p["emb_layer_norm_after"]["scale"], jnp.float32),
        fn_bias=jnp.asarray(p["emb_layer_norm_after"]["bias"], jnp.float32),
    )
