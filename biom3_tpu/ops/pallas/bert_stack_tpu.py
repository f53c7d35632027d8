"""Whole-tower fused BERT kernel with streamed weights (Pallas TPU).

Text-tower twin of ``esm2_stack_tpu``: one ``pallas_call`` runs all
``depth`` post-LN BERT layers for Stage-1 serving (ref tower:
``Stage1_source/model.py:91-132`` — PubMedBERT-base CLS of the last hidden
state) and emits ONLY the (B, E) CLS vectors.

Differences from the ESM2 kernel, all reference-faithful:
  * embeddings stay OUTSIDE (a 30 522-row vocab gather is an XLA gather,
    not a one-hot matmul) — the kernel input is the post-embedding-LN
    activation (B, L, E);
  * post-LN residual blocks (LN *after* attention/FF adds, eps 1e-12);
  * NO attention mask — the reference calls BERT without one
    (model.py:124,129), PAD tokens attend (models/bert.py:136-137);
  * no rotary; plain scaled dot-product heads (H=12, Dh=64).

bf16 inputs run the serving fast path (bf16 MXU, f32 accumulation/softmax);
f32 inputs run HIGHEST-precision (parity twin, tests/test_bert_stack.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.ops.pallas.fused_layer_tpu import _gelu, _layernorm
from biom3_tpu.ops.pallas.quant import (
    quant_cols,
    quant_rows,
    quantize_weight_int8,
)


def _bert_stack_kernel(
    x0_ref,                                      # (rows, L, E) embedded input
    ls1_ref, lb1_ref,                            # (1, 1, E) attention_norm
    wqt_ref, wkt_ref, wvt_ref,                   # (1, E, E) pre-transposed
    bq_ref, bk_ref, bv_ref,                      # (1, 1, E)
    wo_ref, bo_ref,                              # (1, E, E) (in,out), (1, 1, E)
    ls2_ref, lb2_ref,                            # (1, 1, E) output_norm
    w1_ref, b1_ref,                              # (1, E, F), (1, 1, F)
    w2_ref, b2_ref,                              # (1, F, E), (1, 1, E)
    s1_ref, s2_ref,                              # (1, 1, F), (1, 1, E) int8
    #   per-out-channel dequant scales (ones when ff_quant == "none")
    sq_ref, sk_ref, sv_ref, so_ref,              # (1, 1, E) proj dequant
    #   scales (ones when proj_quant == "none")
    o_ref,                                       # (rows, 1, E) f32 CLS
    h_ref,                                       # (rows, L, E) cdtype
    attn_ref,                                    # (E, L) cdtype
    qkv_ref,                                     # (3E, L) cdtype
    xres_ref,                                    # (L, E) f32
    *, depth, rows, heads, ff_block_l, precision, gelu, eps, ff_quant,
    proj_quant, softmax_opt, ln_onepass,
):
    l = pl.program_id(1)
    cdtype = h_ref.dtype
    L, E = h_ref.shape[1], h_ref.shape[2]
    Dh = E // heads
    scale = Dh ** -0.5

    @pl.when(l == 0)
    def _load():
        for r in range(rows):
            h_ref[r] = x0_ref[r].astype(cdtype)

    for r in range(rows):
        xres_ref[:] = h_ref[r].astype(jnp.float32)               # (L, E)
        # post-LN: projections read the raw residual, not a normed copy
        xt = xres_ref[:].astype(cdtype).T                        # (E, L)

        if proj_quant == "int8":
            qxt, axt = quant_cols(xt)                            # (E,L),(1,L)

        def projt(dst, wt_ref, b_ref, s_ref):
            if proj_quant == "int8":
                out = jax.lax.dot_general(
                    wt_ref[0], qxt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * s_ref[0, 0][:, None] * axt
            else:
                out = jax.lax.dot_general(
                    wt_ref[0].astype(cdtype), xt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
            qkv_ref[dst * E:(dst + 1) * E, :] = (
                out + b_ref[0, 0].astype(jnp.float32)[:, None]
            ).astype(cdtype)

        projt(0, wqt_ref, bq_ref, sq_ref)
        projt(1, wkt_ref, bk_ref, sk_ref)
        projt(2, wvt_ref, bv_ref, sv_ref)

        def head_body(hd, _):
            off = pl.multiple_of(hd * Dh, Dh)
            qh = qkv_ref[pl.ds(off, Dh), :]
            kh = qkv_ref[pl.ds(E + off, Dh), :]
            vh = qkv_ref[pl.ds(2 * E + off, Dh), :]
            dots = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                    # (Lq, Lk)
            if softmax_opt:
                # scale·log2e pre-folded into wq/bq host-side: dots are
                # log2-domain — no scale pass, exp2, reciprocal-mul
                m = jnp.max(dots, axis=-1, keepdims=True)
                e = jnp.exp2(dots - m)
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(cdtype)
            else:
                dots = dots * scale
                m = jnp.max(dots, axis=-1, keepdims=True)
                e = jnp.exp(dots - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
            attn_ref[pl.ds(off, Dh), :] = jax.lax.dot_general(
                vh, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ).astype(cdtype)
            return _

        jax.lax.fori_loop(0, heads, head_body, None)

        if proj_quant == "int8":
            qattn, aat = quant_cols(attn_ref[:])                 # (E,L),(1,L)
            out = jax.lax.dot_general(
                qattn, wo_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * aat.T * so_ref[0, 0]         # (L, E)
        else:
            out = jax.lax.dot_general(
                attn_ref[:], wo_ref[0].astype(cdtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                                                    # (L, E)
        xres_ref[:] = _layernorm(
            xres_ref[:] + out + bo_ref[0, 0].astype(jnp.float32),
            ls1_ref[0, 0], lb1_ref[0, 0], eps=eps, one_pass=ln_onepass,
        )

        def ff_body(i, _):
            off = pl.multiple_of(i * ff_block_l, ff_block_l)
            xc = xres_ref[pl.ds(off, ff_block_l), :]
            if ff_quant == "int8":
                # int8 MXU path: per-row dynamic activation quant x
                # per-out-channel int8 weights, int32 accumulation, fused
                # rank-1 f32 dequant (ops/pallas/quant recipe)
                qx, ax = quant_rows(xc)
                h1 = jax.lax.dot_general(
                    qx, w1_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ax * s1_ref[0, 0] + b1_ref[
                    0, 0
                ].astype(jnp.float32)
                h1 = _gelu(h1, gelu)
                qh, ah = quant_rows(h1)
                out = jax.lax.dot_general(
                    qh, w2_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ah * s2_ref[0, 0] + b2_ref[
                    0, 0
                ].astype(jnp.float32)
            else:
                h1 = jax.lax.dot_general(
                    xc.astype(cdtype), w1_ref[0].astype(cdtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ) + b1_ref[0, 0].astype(jnp.float32)
                h1 = _gelu(h1, gelu).astype(cdtype)
                out = jax.lax.dot_general(
                    h1, w2_ref[0].astype(cdtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ) + b2_ref[0, 0].astype(jnp.float32)
            h_ref[r, pl.ds(off, ff_block_l)] = _layernorm(
                xc + out, ls2_ref[0, 0], lb2_ref[0, 0], eps=eps,
                one_pass=ln_onepass,
            ).astype(cdtype)
            return _

        jax.lax.fori_loop(0, L // ff_block_l, ff_body, None)

        @pl.when(l == depth - 1)
        def _head():
            # last layer's output_norm IS the final norm; CLS = position 0
            o_ref[r] = h_ref[r, 0:1, :].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "rows", "ff_block_l", "gelu", "vmem_limit_mb", "eps",
        "w_buffers", "ff_buffers", "interpret", "ff_quant", "proj_quant",
        "softmax_opt", "ln_onepass",
    ),
)
def fused_bert_cls(
    x0: jax.Array,                   # (B, L, E) post-embedding-LN activations
    ln1_scale: jax.Array, ln1_bias: jax.Array,   # (depth, E)
    wq: jax.Array, wk: jax.Array, wv: jax.Array, # (depth, E, E) (in, out)
    bq: jax.Array, bk: jax.Array, bv: jax.Array, # (depth, E)
    wo: jax.Array, bo: jax.Array,                # (depth, E, E), (depth, E)
    ln2_scale: jax.Array, ln2_bias: jax.Array,   # (depth, E)
    w1: jax.Array, b1: jax.Array,                # (depth, E, F), (depth, F)
    w2: jax.Array, b2: jax.Array,                # (depth, F, E), (depth, E)
    s1: jax.Array | None = None,                 # (depth, F) int8 FF dequant
    s2: jax.Array | None = None,                 # (depth, E) scales
    sq: jax.Array | None = None,                 # (depth, E) int8 proj
    sk: jax.Array | None = None,                 # dequant scales
    sv: jax.Array | None = None,
    so: jax.Array | None = None,
    *,
    heads: int,
    rows: int = 2,
    ff_block_l: int = 256,
    gelu: str = "erf",
    eps: float = 1e-12,
    vmem_limit_mb: int = 100,
    w_buffers: int = 2,
    ff_buffers: int = 2,
    interpret: bool = False,
    ff_quant: str = "none",
    proj_quant: str = "none",
    softmax_opt: bool = False,
    ln_onepass: bool = False,
) -> jax.Array:
    """Full BERT tower forward → (B, E) f32 CLS of the last hidden state.

    ``proj_quant='int8'``: q/k/v/out projections on the int8 MXU path
    (per-column dynamic activation quant of the post-LN residual ×
    per-out-channel int8 weights — the ESM2 recipe; dots/softmax stay
    bf16/f32).  Post-LN means the quantized activation is the RAW
    residual, so the drift gate matters more here than on the pre-LN
    towers.
    ``softmax_opt``/``ln_onepass``: exact-math VPU-pass shaving — exp2-domain
    softmax with scale·log2e pre-folded into wq/bq (or the sq dequant
    scales on the int8 path), and one-read E[x²]−mean² LayerNorms (see
    ops/pallas/quant + stack_kernel_tpu)."""
    B, L, E = x0.shape
    depth = ln1_scale.shape[0]
    F = w1.shape[2]
    if B % rows:
        raise ValueError(f"B={B} not divisible by rows={rows}")
    ff_block_l = min(ff_block_l, L)
    while L % ff_block_l:
        ff_block_l //= 2
    cdtype = x0.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    if ff_quant == "int8":
        if w1.dtype != jnp.int8 or w2.dtype != jnp.int8:
            raise ValueError("ff_quant='int8' needs int8 w1/w2 "
                             "(bert_stack_arrays(..., ff_quant='int8'))")
        if s1 is None or s2 is None:
            raise ValueError("ff_quant='int8' needs s1/s2 dequant scales")
    else:
        # unused by the kernel when quant is off, but the ref list is fixed
        s1 = jnp.ones((depth, F), jnp.float32)
        s2 = jnp.ones((depth, E), jnp.float32)
    if proj_quant == "int8":
        if any(w.dtype != jnp.int8 for w in (wq, wk, wv, wo)):
            raise ValueError("proj_quant='int8' needs int8 wq/wk/wv/wo "
                             "(bert_stack_arrays(..., proj_quant='int8'))")
        if any(s is None for s in (sq, sk, sv, so)):
            raise ValueError("proj_quant='int8' needs sq/sk/sv/so scales")
    else:
        sq = sk = sv = so = jnp.ones((depth, E), jnp.float32)

    if softmax_opt:
        # fold head_dim^-0.5·log2e into the q projection + bias host-side
        # (loop-invariant; exact on the int8 dequant scales) so the kernel
        # softmax is exp2(dots−m)
        fold = (E // heads) ** -0.5 * 1.4426950408889634
        bq = bq * fold
        if proj_quant == "int8":
            sq = sq * fold
        else:
            wq = wq * fold

    single = pl.Buffered(buffer_count=1)
    wmode = pl.Buffered(buffer_count=w_buffers)
    ffmode = pl.Buffered(buffer_count=ff_buffers)

    def lyr(rdim, cdim, mode):
        return pl.BlockSpec(
            (1, rdim, cdim), lambda g, l: (l, 0, 0), memory_space=pltpu.VMEM,
            pipeline_mode=mode,
        )

    kernel = functools.partial(
        _bert_stack_kernel,
        depth=depth, rows=rows, heads=heads, ff_block_l=ff_block_l,
        precision=precision, gelu=gelu, eps=eps, ff_quant=ff_quant,
        proj_quant=proj_quant,
        softmax_opt=softmax_opt, ln_onepass=ln_onepass,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // rows, depth),
        in_specs=[
            pl.BlockSpec((rows, L, E), lambda g, l: (g, 0, 0),
                         memory_space=pltpu.VMEM),               # x0
            lyr(1, E, single), lyr(1, E, single),                # ln1
            lyr(E, E, wmode), lyr(E, E, wmode), lyr(E, E, wmode),  # wqᵀwkᵀwvᵀ
            lyr(1, E, single), lyr(1, E, single), lyr(1, E, single),
            lyr(E, E, wmode), lyr(1, E, single),                 # wo bo
            lyr(1, E, single), lyr(1, E, single),                # ln2
            lyr(E, F, ffmode), lyr(1, F, single),                # w1 b1
            lyr(F, E, ffmode), lyr(1, E, single),                # w2 b2
            lyr(1, F, single), lyr(1, E, single),                # s1 s2
            lyr(1, E, single), lyr(1, E, single),                # sq sk
            lyr(1, E, single), lyr(1, E, single),                # sv so
        ],
        out_specs=pl.BlockSpec(
            (rows, 1, E), lambda g, l: (g, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, L, E), cdtype),
            pltpu.VMEM((E, L), cdtype),
            pltpu.VMEM((3 * E, L), cdtype),
            pltpu.VMEM((L, E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x0,
        ln1_scale[:, None, :], ln1_bias[:, None, :],
        jnp.swapaxes(wq, 1, 2), jnp.swapaxes(wk, 1, 2), jnp.swapaxes(wv, 1, 2),
        bq[:, None, :], bk[:, None, :], bv[:, None, :],
        wo, bo[:, None, :],
        ln2_scale[:, None, :], ln2_bias[:, None, :],
        w1, b1[:, None, :], w2, b2[:, None, :],
        s1[:, None, :], s2[:, None, :],
        sq[:, None, :], sk[:, None, :], sv[:, None, :], so[:, None, :],
    )[:, 0, :]


def bert_stack_arrays(bert_params: dict, num_layers: int, dtype=jnp.bfloat16,
                      ff_quant: str = "none", proj_quant: str = "none"):
    """Flax BERT param tree → stacked arrays for ``fused_bert_cls``.

    Embedding tables are NOT included — embed with ``bert_embed`` (XLA
    gather + LN) and pass the activations in.  ``ff_quant='int8'`` replaces
    w1/w2 with per-out-channel int8 + s1/s2 dequant scales;
    ``proj_quant='int8'`` does the same for wq/wk/wv/wo (+ sq/sk/sv/so).
    Pass the same flags to ``fused_bert_cls``."""
    p = bert_params.get("params", bert_params)

    def stack(getter, sdtype=None):
        return jnp.stack(
            [jnp.asarray(getter(p[f"layer_{i}"]), sdtype or dtype)
             for i in range(num_layers)]
        )

    if ff_quant == "int8":
        w1q, s1 = quantize_weight_int8(
            stack(lambda q: q["intermediate"]["kernel"], jnp.float32))
        w2q, s2 = quantize_weight_int8(
            stack(lambda q: q["output"]["kernel"], jnp.float32))
        ff = dict(w1=w1q, w2=w2q, s1=s1, s2=s2)
    else:
        ff = dict(w1=stack(lambda q: q["intermediate"]["kernel"]),
                  w2=stack(lambda q: q["output"]["kernel"]))

    if proj_quant == "int8":
        proj = {}
        for name, key in (("q", "query"), ("k", "key"), ("v", "value")):
            w_, s_ = quantize_weight_int8(
                stack(lambda q, key=key: q["attention"][key]["kernel"],
                      jnp.float32))
            proj[f"w{name}"], proj[f"s{name}"] = w_, s_
        wo_, so_ = quantize_weight_int8(
            stack(lambda q: q["attention_output"]["kernel"], jnp.float32))
        proj["wo"], proj["so"] = wo_, so_
    else:
        proj = dict(
            wq=stack(lambda q: q["attention"]["query"]["kernel"]),
            wk=stack(lambda q: q["attention"]["key"]["kernel"]),
            wv=stack(lambda q: q["attention"]["value"]["kernel"]),
            wo=stack(lambda q: q["attention_output"]["kernel"]),
        )

    return dict(
        **ff,
        **proj,
        ln1_scale=stack(lambda q: q["attention_norm"]["scale"]),
        ln1_bias=stack(lambda q: q["attention_norm"]["bias"]),
        bq=stack(lambda q: q["attention"]["query"]["bias"]),
        bk=stack(lambda q: q["attention"]["key"]["bias"]),
        bv=stack(lambda q: q["attention"]["value"]["bias"]),
        bo=stack(lambda q: q["attention_output"]["bias"]),
        ln2_scale=stack(lambda q: q["output_norm"]["scale"]),
        ln2_bias=stack(lambda q: q["output_norm"]["bias"]),
        b1=stack(lambda q: q["intermediate"]["bias"]),
        b2=stack(lambda q: q["output"]["bias"]),
    )


def bert_embed(bert_params: dict, input_ids, *, eps: float = 1e-12,
               dtype=jnp.bfloat16):
    """word + position + token-type-0 embeddings → LN (ref
    models/bert.py:121-132); the XLA half that feeds ``fused_bert_cls``."""
    p = bert_params.get("params", bert_params)
    ids = input_ids.astype(jnp.int32)
    L = ids.shape[1]
    word = jnp.asarray(p["word_embeddings"]["embedding"])
    pos = jnp.asarray(p["position_embeddings"]["embedding"])
    typ = jnp.asarray(p["token_type_embeddings"]["embedding"])
    x = word[ids] + pos[None, :L, :] + typ[0][None, None, :]
    scale = jnp.asarray(p["embeddings_norm"]["scale"], jnp.float32)
    bias = jnp.asarray(p["embeddings_norm"]["bias"], jnp.float32)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(dtype)
