"""On-chip A/B experiments for the Stage-3 layer kernels (throughput triage).

Everything interleaved in one process with tiny host fetches (tunnel
protocol, CLAUDE.md).  Variants:

  * baseline      — current fused_attn_half + fused_ff_half, 16 layers
  * stack r{R}b{F}— whole-stack kernel, rows=R, ff_buffers=F
  * ff_gelu/tanh/relu — FF kernel with exact-erf vs tanh-approx vs relu
                    (sizes the VPU transcendental share)
  * attn_recip    — attention softmax with reciprocal-mul vs divide

Run: python tools/exp_kernels.py [--steps 64] [--which all|stack|ff|attn]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.ops.pallas.fused_layer_tpu import (
    _gelu_exact,
    _layernorm,
    fused_attn_half,
    fused_ff_half,
)

CFG = ProteoScribeConfig()
B = 32


def timed(fn, *args, steps, runs=2, label=""):
    try:
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — VMEM OOM etc.
        print(f"{label:16s}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:16s}: {best/steps*1e3:8.3f} ms/iter  "
          f"(best {best:.2f}s, compile {compile_s:.0f}s)")
    return best / steps


def setup():
    model = ProteoScribe(CFG, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, CFG.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.cond_dim)),
    )
    return variables["params"], variables


# ---------------- FF GELU variants ----------------

def _gelu_tanh(x):
    # tanh-approx GELU: no divide, one tanh (hw op) — bf16-path candidate
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _ff_kernel_v(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 o_ref, *, act):
    cdtype = x_ref.dtype
    x = x_ref[0]
    xn = _layernorm(x, ls_ref[0], lb_ref[0]).astype(cdtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    if act == "erf":
        h = _gelu_exact(h)
    elif act == "tanh":
        h = _gelu_tanh(h)
    else:
        h = jnp.maximum(h, 0.0)
    h = h.astype(cdtype)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act",))
def ff_v(x, ls, lb, w1, b1, w2, b2, *, act):
    Bx, L, d = x.shape
    ff = w1.shape[1]
    block_l = 512
    single = pl.Buffered(buffer_count=1)
    tile = pl.BlockSpec((1, block_l, d), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    const2 = lambda r, c: pl.BlockSpec((r, c), lambda b, i: (0, 0),
                                       memory_space=pltpu.VMEM,
                                       pipeline_mode=single)
    vec = lambda c: pl.BlockSpec((1, c), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=single)
    return pl.pallas_call(
        functools.partial(_ff_kernel_v, act=act),
        grid=(Bx, L // block_l),
        in_specs=[tile, vec(d), vec(d), const2(d, ff), vec(ff),
                  const2(ff, d), vec(d)],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((Bx, L, d), x.dtype),
    )(x, ls[None, :], lb[None, :], w1, b1[None, :], w2, b2[None, :])


def run_ff(p, steps, runs):
    h0 = jax.random.normal(jax.random.key(1), (B, CFG.max_seq_len, CFG.dim),
                           jnp.bfloat16) * 0.02
    lp = p["layer_0_0"]
    args = (
        lp["ff_norm"]["scale"], lp["ff_norm"]["bias"],
        lp["ff_w1"]["kernel"].astype(jnp.bfloat16), lp["ff_w1"]["bias"],
        lp["ff_w2"]["kernel"].astype(jnp.bfloat16), lp["ff_w2"]["bias"],
    )
    for act in ("erf", "tanh", "relu"):
        @jax.jit
        def run(h, act=act):
            def body(c, _):
                return ff_v(c, *args, act=act), ()
            out, _ = jax.lax.scan(body, h, None, length=steps)
            return out[0, 0, :8]
        timed(run, h0, steps=steps, runs=runs, label=f"ff_{act}")


# ---------------- attention softmax variant ----------------

def _attn_kernel_recip(
    x_ref, b_ref, ls_ref, lb_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, bo_ref,
    o_ref, *, local_heads, heads, window,
):
    """fused_attn_half._attn_kernel with softmax divides → reciprocal muls
    (both local band and linear-attention softmaxes)."""
    L, d = x_ref.shape[1], x_ref.shape[2]
    Dh = d // heads
    nw = L // window
    nl, ng = local_heads, heads - local_heads
    W = window
    cdtype = x_ref.dtype
    scale = Dh ** -0.5

    x = x_ref[0]
    xb = x + b_ref[0, 0][None, :].astype(x.dtype)
    xnt = _layernorm(xb, ls_ref[0], lb_ref[0]).astype(cdtype).T

    def projt(wt_ref):
        return jax.lax.dot_general(
            wt_ref[:], xnt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdtype)

    qt, kt, vt = projt(wqt_ref), projt(wkt_ref), projt(wvt_ref)

    qtl = qt[:nl * Dh, :].reshape(nl, Dh, L)
    ktl = kt[:nl * Dh, :].reshape(nl, Dh, L)
    vtl = vt[:nl * Dh, :].reshape(nl, Dh, L)
    w_strips = []
    for w in range(nw):
        lo = max(0, (w - 1) * W)
        hi = min(L, (w + 2) * W)
        qw = qtl[:, :, w * W:(w + 1) * W]
        kn = ktl[:, :, lo:hi]
        vn = vtl[:, :, lo:hi]
        dots = jax.lax.dot_general(
            qw, kn, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p_ = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(cdtype)
        avt = jax.lax.dot_general(
            vn, p_, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(cdtype)
        w_strips.append(avt.reshape(nl * Dh, W))
    local_t = jnp.concatenate(w_strips, axis=1)

    qtg = qt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    ktg = kt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    vtg = vt[nl * Dh:, :].reshape(ng, Dh, L)
    # manual softmaxes with reciprocal-mul
    qm = jnp.max(qtg, axis=1, keepdims=True)
    qe = jnp.exp(qtg - qm)
    qf = (qe * (1.0 / jnp.sum(qe, axis=1, keepdims=True)) * scale).astype(cdtype)
    km = jnp.max(ktg, axis=2, keepdims=True)
    ke = jnp.exp(ktg - km)
    kf = (ke * (1.0 / jnp.sum(ke, axis=2, keepdims=True))).astype(cdtype)
    ctx = jax.lax.dot_general(
        kf, vtg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)
    lin_t = jax.lax.dot_general(
        ctx, qf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)

    attnt = jnp.concatenate([local_t, lin_t.reshape(ng * Dh, L)], axis=0)
    outt = jax.lax.dot_general(
        wot_ref[:], attnt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = outt.T + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xb.astype(jnp.float32) + out).astype(o_ref.dtype)


@jax.jit
def attn_recip(x, bias, ls, lb, wq, wk, wv, wo, bo):
    Bx, L, d = x.shape
    single = pl.Buffered(buffer_count=1)
    row = lambda r, c: pl.BlockSpec((1, r, c), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    const2 = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM,
                                       pipeline_mode=single)
    vec = lambda c: pl.BlockSpec((1, c), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=single)
    return pl.pallas_call(
        functools.partial(_attn_kernel_recip, local_heads=CFG.local_heads,
                          heads=CFG.heads, window=CFG.local_window),
        grid=(Bx,),
        in_specs=[
            row(L, d),
            pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM, pipeline_mode=single),
            vec(d), vec(d), const2(d, d), const2(d, d), const2(d, d),
            const2(d, d), vec(d),
        ],
        out_specs=row(L, d),
        out_shape=jax.ShapeDtypeStruct((Bx, L, d), x.dtype),
    )(x, bias[:, None, :], ls[None, :], lb[None, :],
      wq.T, wk.T, wv.T, wo.T, bo[None, :])


def run_attn(p, steps, runs):
    h0 = jax.random.normal(jax.random.key(1), (B, CFG.max_seq_len, CFG.dim),
                           jnp.bfloat16) * 0.02
    bias = jnp.zeros((B, CFG.dim), jnp.bfloat16)
    lp = p["layer_0_0"]
    ap = lp["attn"]
    wq = ap["to_q_kernel"].astype(jnp.bfloat16)
    wk = ap["to_k_kernel"].astype(jnp.bfloat16)
    wv = ap["to_v_kernel"].astype(jnp.bfloat16)
    wo = ap["to_out"]["kernel"].astype(jnp.bfloat16)
    bo = ap["to_out"]["bias"]
    ls, lb = lp["attn_norm"]["scale"], lp["attn_norm"]["bias"]

    @jax.jit
    def run_base(h):
        def body(c, _):
            return fused_attn_half(
                c, bias, ls, lb, wq, wk, wv, wo, bo,
                local_heads=CFG.local_heads, heads=CFG.heads,
                window=CFG.local_window,
            ), ()
        out, _ = jax.lax.scan(body, h, None, length=steps)
        return out[0, 0, :8]

    @jax.jit
    def run_recip(h):
        def body(c, _):
            return attn_recip(c, bias, ls, lb, wq, wk, wv, wo, bo), ()
        out, _ = jax.lax.scan(body, h, None, length=steps)
        return out[0, 0, :8]

    timed(run_base, h0, steps=steps, runs=runs, label="attn_base")
    timed(run_recip, h0, steps=steps, runs=runs, label="attn_recip")


# ---------------- whole-stack kernel ----------------

def run_stack(variables, steps, runs, combos):
    from biom3_tpu.models.fused_forward import make_stack_apply

    z_c = jnp.zeros((B, CFG.cond_dim), jnp.float32)
    ids0 = jnp.zeros((B, CFG.max_seq_len), jnp.int32)
    pos = jnp.tile(jnp.arange(1, dtype=jnp.int32)[None], (B, 1))

    for rows, ffb, gelu, *rest in combos:
        kw = rest[0] if rest else {}
        label_extra = "".join(f"_{k}{v}" for k, v in kw.items())
        apply_fn = make_stack_apply(
            CFG, rows=rows, ff_buffers=ffb, gelu=gelu, **kw
        )

        @jax.jit
        def run(v, ids, apply_fn=apply_fn):
            onehot0 = (jnp.arange(CFG.max_seq_len, dtype=jnp.int32)[None]
                       == 0)                                   # (1, L)

            def body(c, i):
                lg = apply_fn(v, c, jnp.full((B,), i % 1024,
                                             jnp.int32), z_c, pos)
                tok = jnp.argmax(lg[:, 0], axis=-1).astype(jnp.int32)
                # one-hot broadcast write — .at[:, 0].set inside a scan
                # triggers the scatter-in-scan compile pathology
                # (630 ms/iter + 7-min compiles measured)
                nc = jnp.where(onehot0, tok[:, None], c)
                return nc, ()
            out, _ = jax.lax.scan(body, ids,
                                  jnp.arange(steps, dtype=jnp.int32))
            return out[0, :8]

        timed(run, variables, ids0, steps=steps, runs=runs,
              label=f"stack_r{rows}b{ffb}_{gelu}{label_extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    p, variables = setup()
    print(f"device: {jax.devices()[0]}  B={B} L={CFG.max_seq_len}")

    if args.which in ("all", "ff"):
        run_ff(p, args.steps, args.runs)
    if args.which in ("all", "attn"):
        run_attn(p, args.steps, args.runs)
    if args.which in ("all", "stack"):
        run_stack(variables, args.steps, args.runs,
                  combos=[(1, 1, "erf"), (1, 2, "tanh"), (1, 1, "tanh"),
                          (2, 1, "tanh")])
    if args.which == "stack2":
        # round-3 follow-ups: batch-rows interleaving (independent chains
        # the scheduler can overlap) and FF L-tiling
        run_stack(variables, args.steps, args.runs,
                  combos=[(1, 1, "tanh"),
                          (1, 1, "tanh", {"stream": "dl"}),
                          (2, 1, "tanh"), (4, 1, "tanh"),
                          (2, 1, "tanh", {"stream": "dl"}),
                          (1, 1, "tanh", {"ff_block_l": 512}),
                          (1, 1, "tanh", {"ff_block_l": 1024}),
                          (1, 1, "tanh", {"stream": "dl",
                                          "ff_block_l": 1024})])
    if args.which == "streamed":
        # per-layer weight-streaming path (grid=(B/rows, depth)) at the
        # reference shape, vs the resident default — the streamed path is
        # the fallback plan_stack_kernel picks for configs whose stacked
        # weights exceed VMEM, and has never been timed on chip
        run_stack(variables, args.steps, args.runs,
                  combos=[(1, 1, "tanh", {"resident": True}),
                          (1, 1, "tanh", {"resident": False}),
                          (1, 2, "tanh", {"resident": False}),
                          (1, 1, "tanh", {"resident": False,
                                          "ff_quant": "int8"})])
    if args.which == "rows2":
        # the dl+rows>=2 combination compiles since the 2026-08-19 backend
        # (tools/repro_compiler_crashes.py: PASS) — A/B it against the
        # serving default (rows=1, dl, int8 ff+proj) now that it's testable
        run_stack(variables, args.steps, args.runs,
                  combos=[(1, 1, "tanh", {"resident": True, "stream": "dl",
                                          "ff_quant": "int8",
                                          "proj_quant": "int8"}),
                          (2, 1, "tanh", {"resident": True, "stream": "dl",
                                          "ff_quant": "int8",
                                          "proj_quant": "int8"}),
                          (4, 1, "tanh", {"resident": True, "stream": "dl",
                                          "ff_quant": "int8",
                                          "proj_quant": "int8"})])
    if args.which == "vpu":
        # VPU-pass shaving on the serving default (dl-resident int8
        # ff+proj): exp2-folded local softmax (softmax_opt), one-read
        # LayerNorms (ln_onepass), FF L-tile width.  All exact-math
        # rewrites — parity gated in tests/test_stack_kernel.py.
        base = {"resident": True, "stream": "dl",
                "ff_quant": "int8", "proj_quant": "int8"}
        run_stack(variables, args.steps, args.runs,
                  combos=[
                      (1, 1, "tanh", dict(base)),
                      (1, 1, "tanh", dict(base, softmax_opt=True)),
                      (1, 1, "tanh", dict(base, ln_onepass=True)),
                      (1, 1, "tanh", dict(base, softmax_opt=True,
                                          ln_onepass=True)),
                      (1, 1, "tanh", dict(base, softmax_opt=True,
                                          ln_onepass=True, ff_block_l=512)),
                      (1, 1, "tanh", dict(base, softmax_opt=True,
                                          ln_onepass=True, ff_block_l=1024)),
                  ])
    if args.which == "local":
        # strips-loop vs banded (one batched matmul over all (head, window)
        # strips) local attention on the serving default — the ablate sweep
        # put the local section at ~5.2 ms of the 18.0 ms call (~20% MXU
        # efficiency), so batching its dispatches is the biggest lever.
        base = {"resident": True, "stream": "dl",
                "ff_quant": "int8", "proj_quant": "int8",
                "softmax_opt": True, "ln_onepass": True}
        run_stack(variables, args.steps, args.runs,
                  combos=[
                      (1, 1, "tanh", dict(base)),
                      (1, 1, "tanh", dict(base, local_impl="banded")),
                      (1, 1, "tanh", dict(base, local_impl="banded16")),
                      (1, 1, "tanh", dict(base, local_impl="banded8")),
                  ])
    if args.which == "bandmid":
        # bandmid: middle windows batched over pure-slice bands (no pad, no
        # mask — the banded forms crash Mosaic even post-reboot), edges as
        # strips.  Sweep the chunk size; 48 = all 6 middle windows × nl=8
        # in one dispatch pair per layer.
        base = {"resident": True, "stream": "dl",
                "ff_quant": "int8", "proj_quant": "int8",
                "softmax_opt": True, "ln_onepass": True}
        run_stack(variables, args.steps, args.runs,
                  combos=[
                      (1, 1, "tanh", dict(base)),
                      (1, 1, "tanh", dict(base, local_impl="bandmid16")),
                      (1, 1, "tanh", dict(base, local_impl="bandmid24")),
                      (1, 1, "tanh", dict(base, local_impl="bandmid48")),
                  ])
    if args.which == "attnq":
        # int8 local-window dots + pv (attn_quant='int8') vs the serving
        # default: the ablate sweep put the local section at ~5.2 ms of
        # the 18.0 ms call with the K=Dh=32 qk contraction capping bf16 at
        # ~25% MXU utilization — the int8 MXU's 2× peak halves the matmul
        # time there; the dequants are rank-1 factorable (see
        # stack_kernel_tpu._attn_core_t) and drift-gated in
        # tests/test_stack_kernel.py::test_stack_kernel_attn_quant_int8_drift
        base = {"resident": True, "stream": "dl",
                "ff_quant": "int8", "proj_quant": "int8",
                "softmax_opt": True, "ln_onepass": True}
        run_stack(variables, args.steps, args.runs,
                  combos=[
                      (1, 1, "tanh", dict(base)),
                      (1, 1, "tanh", dict(base, attn_quant="int8")),
                  ])
    if args.which == "ablate":
        # timing-only decomposition of the serving default (WRONG math in
        # the ablated variants — never a serving mode): where do the 18 ms
        # go?  no_attn/no_ff split the sublayers; staticq prices the
        # dynamic activation-quant amax reductions of the int8 path.
        base = {"resident": True, "stream": "dl",
                "ff_quant": "int8", "proj_quant": "int8",
                "softmax_opt": True, "ln_onepass": True}
        run_stack(variables, args.steps, args.runs,
                  combos=[
                      (1, 1, "tanh", dict(base)),
                      (1, 1, "tanh", dict(base, ablate="no_attn")),
                      (1, 1, "tanh", dict(base, ablate="no_ff")),
                      (1, 1, "tanh", dict(base, ablate="staticq")),
                      (1, 1, "tanh", dict(base, ablate="no_attn,staticq")),
                      # attention-internal split: projections vs local
                      # strips vs global heads
                      (1, 1, "tanh", dict(base, ablate="noqkv")),
                      (1, 1, "tanh", dict(base, ablate="nolocal")),
                      (1, 1, "tanh", dict(base, ablate="noglobal")),
                      (1, 1, "tanh", dict(base, ablate="nolocal,noglobal")),
                      # bf16 twins bound the attention cost without quant
                      (1, 1, "tanh", {"resident": True, "stream": "dl"}),
                      (1, 1, "tanh", {"resident": True, "stream": "dl",
                                      "ablate": "no_attn"}),
                  ])
    if args.which == "int8":
        # int8-FF serving candidate vs the bf16 resident kernel (the bench
        # path) — FF is 2/3 of layer FLOPs; v5e int8 MXU is ~2x bf16
        run_stack(variables, args.steps, args.runs,
                  combos=[(1, 1, "tanh", {"resident": True}),
                          (1, 1, "tanh", {"resident": True,
                                          "ff_quant": "int8"}),
                          (1, 1, "tanh", {"resident": True, "stream": "dl",
                                          "ff_quant": "int8"}),
                          (1, 1, "tanh", {"resident": True,
                                          "ff_block_l": 512,
                                          "ff_quant": "int8"}),
                          (1, 1, "tanh", {"resident": True,
                                          "ff_quant": "int8",
                                          "proj_quant": "int8"}),
                          (1, 1, "tanh", {"resident": True, "stream": "dl",
                                          "ff_quant": "int8",
                                          "proj_quant": "int8"})])


if __name__ == "__main__":
    main()
