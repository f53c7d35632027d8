"""Fused ProteoScribe layer kernels (Pallas TPU).

The Stage-3 sampling hot loop (ref ``Stage3_source/sampling_analysis.py:
204-265``) is dominated by the 16-layer transformer forward.  Compiled op by
op, each layer materializes ~18 HBM tensors (norms, projections, head
splits, window reshapes, softmaxes, concats) — on the tunneled chip every
materialized tensor costs a fixed ~0.3 ms regardless of FLOPs, so the layer
is op-count-bound, not FLOP-bound (measured: full forward ~89 ms vs ~18 ms
of pure matmul time).

These kernels collapse each layer into TWO HBM round-trips:

  * ``fused_attn_half``: x → x+bias → LayerNorm → qᵀ/kᵀ/vᵀ (computed
    directly in transposed form so each head is a SUBLANE slice — lane-dim
    head slicing would relayout on every access) → 8 local-window heads
    (W=128, ±1 look-around; all heads of a window batched into one
    ``dot_general`` pair) + 8 linear-attention heads → output projection →
    +residual, per batch row in VMEM.
  * ``fused_ff_half``: x → LayerNorm → 512→2048 GELU 512 → +residual,
    tiled over sequence blocks.

(A fully-transposed residual stream — kernels in (d, L) end to end, no
in-kernel transposes — was tried and measured ~11% slower on-chip; the two
(L, d)↔(d, L) transposes per attention program are cheaper than running
the norms/FF lane-reductions in transposed form.)

Math matches ``models/proteoscribe.TransformerLayer`` (lucidrains
``linear_attention_transformer==0.19.1`` semantics: pre-norm, qkv bias-free,
local heads first, joint softmax over the 3-window band, linear attention
with feature/sequence softmaxes) — verified in ``tests/test_fused_forward``
against the Flax graph.  bf16 inputs run the fast path (bf16 MXU, f32
accumulation/softmax); f32 inputs run everything in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — below f32
    matmul noise).  Mosaic has no erf/erfc primitive, so exact-GELU needs a
    polynomial."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """0.5·x·(1+erf(x/√2)) — the torch.nn.functional.gelu default the
    reference stack uses (lucidrains FeedForward)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """tanh-approx GELU: max abs deviation from exact = 4.7e-4 (at x≈2.69,
    measured over [-8, 8]) — an order of magnitude below the
    bf16 quantization the perf path already applies to the activations
    (bf16 eps ≈ 7.8e-3 relative).  ~0.19 ms/call cheaper on-chip than the
    erf polynomial (no exp, no divide; tanh is a hardware op) — serving
    bf16-path option; the f32 parity path always uses exact GELU."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _gelu(x, impl: str):
    return _gelu_exact(x) if impl == "erf" else _gelu_tanh(x)


def _layernorm(x, scale, bias, eps=1e-6, one_pass=False):
    """flax.linen.LayerNorm semantics (f32 accumulation).

    ``one_pass``: E[x²]−mean² variance — mean and mean-of-squares come from
    ONE read of x, dropping the (x−mean)² re-read pass.  f32 cancellation
    error ~ε·mean² is negligible for the near-zero-mean LN'd residual
    streams of the serving path; the f32 parity path keeps two-pass."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if one_pass:
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(ms - mean * mean, 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _attn_kernel(
    x_ref, b_ref, ls_ref, lb_ref, wqt_ref, wkt_ref, wvt_ref, wot_ref, bo_ref,
    o_ref, *, local_heads: int, heads: int, window: int, precision,
):
    """Transposed-activation attention: q/k/v live as (d, L) so each head is
    a SUBLANE slice (rows 32h..32h+32 — cheap on TPU, vs lane slices which
    relayout), every window slice is 128-lane aligned, and all local heads
    of a window are processed together via one batched dot_general pair.
    Weights arrive pre-transposed (w.T) from the host wrapper."""
    L, d = x_ref.shape[1], x_ref.shape[2]
    Dh = d // heads
    nw = L // window
    nl, ng = local_heads, heads - local_heads
    W = window
    cdtype = x_ref.dtype  # compute dtype for MXU inputs
    scale = Dh ** -0.5

    x = x_ref[0]
    xb = x + b_ref[0, 0][None, :].astype(x.dtype)   # per-layer time+cond bias
    xnt = _layernorm(xb, ls_ref[0], lb_ref[0]).astype(cdtype).T     # (d, L)

    def projt(wt_ref):
        # (d, d) @ (d, L) → (d, L); f32 accumulate, compute-dtype storage
        return jax.lax.dot_general(
            wt_ref[:], xnt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)

    qt = projt(wqt_ref)
    kt = projt(wkt_ref)
    vt = projt(wvt_ref)

    # ---- local-window heads (first nl), all heads batched per window ----
    qtl = qt[:nl * Dh, :].reshape(nl, Dh, L)
    ktl = kt[:nl * Dh, :].reshape(nl, Dh, L)
    vtl = vt[:nl * Dh, :].reshape(nl, Dh, L)
    w_strips = []
    for w in range(nw):
        lo = max(0, (w - 1) * W)
        hi = min(L, (w + 2) * W)
        qw = qtl[:, :, w * W:(w + 1) * W]                   # (nl, Dh, W)
        kn = ktl[:, :, lo:hi]                               # (nl, Dh, ≤3W)
        vn = vtl[:, :, lo:hi]
        dots = jax.lax.dot_general(
            qw, kn, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                           # (nl, W, ≤3W)
        m = jnp.max(dots, axis=-1, keepdims=True)
        e = jnp.exp(dots - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
        avt = jax.lax.dot_general(
            vn, p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(cdtype)                                    # (nl, Dh, W)
        w_strips.append(avt.reshape(nl * Dh, W))
    local_t = jnp.concatenate(w_strips, axis=1)             # (nl·Dh, L)

    # ---- linear-attention heads (last ng), batched over heads ----
    qtg = qt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    ktg = kt[nl * Dh:, :].reshape(ng, Dh, L).astype(jnp.float32)
    vtg = vt[nl * Dh:, :].reshape(ng, Dh, L)
    qf = (jax.nn.softmax(qtg, axis=1) * scale).astype(cdtype)   # feature dim
    kf = jax.nn.softmax(ktg, axis=2).astype(cdtype)             # sequence dim
    ctx = jax.lax.dot_general(
        kf, vtg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                        # (ng, Dh_k, Dh_v)
    lin_t = jax.lax.dot_general(
        ctx, qf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(cdtype)                                        # (ng, Dh_v, L)

    attnt = jnp.concatenate(
        [local_t, lin_t.reshape(ng * Dh, L)], axis=0
    )                                                       # (d, L)
    outt = jax.lax.dot_general(
        wot_ref[:], attnt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                       # (d, L) f32
    out = outt.T + bo_ref[0].astype(jnp.float32)
    o_ref[0] = (xb.astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("local_heads", "heads", "window", "interpret")
)
def fused_attn_half(
    x: jax.Array,
    bias: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    local_heads: int,
    heads: int,
    window: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, L, d); bias: (B, d) per-layer additive bias (time+cond);
    weights in checkpoint layout (d_in, d_out).
    Returns x + bias + attention(LN(x + bias))."""
    B, L, d = x.shape
    cdtype = x.dtype
    precision = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None

    # everything single-buffered: the per-program compute dwarfs the 1 MB
    # row DMA, and VMEM is the binding constraint at d=512/L=1024
    single = pl.Buffered(buffer_count=1)
    row = lambda r, c: pl.BlockSpec(
        (1, r, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM,
    )
    const2 = lambda r, c: pl.BlockSpec(
        (r, c), lambda b: (0, 0), memory_space=pltpu.VMEM,
        pipeline_mode=single,
    )
    vec = lambda c: pl.BlockSpec(
        (1, c), lambda b: (0, 0), memory_space=pltpu.VMEM,
        pipeline_mode=single,
    )

    return pl.pallas_call(
        functools.partial(
            _attn_kernel, local_heads=local_heads, heads=heads,
            window=window, precision=precision,
        ),
        grid=(B,),
        in_specs=[
            row(L, d),                                     # x
            pl.BlockSpec(
                (1, 1, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM,
                pipeline_mode=single,
            ),                                             # bias (B, 1, d)
            vec(d), vec(d),                                # ln scale/bias
            const2(d, d), const2(d, d), const2(d, d),      # wqᵀ wkᵀ wvᵀ
            const2(d, d), vec(d),                          # woᵀ bo
        ],
        out_specs=row(L, d),
        out_shape=jax.ShapeDtypeStruct((B, L, d), x.dtype),
        interpret=interpret,
    )(
        x, bias[:, None, :], ln_scale[None, :], ln_bias[None, :],
        wq.T, wk.T, wv.T, wo.T, bo[None, :],
    )


def _ff_kernel(
    x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, precision, gelu,
):
    cdtype = x_ref.dtype
    x = x_ref[0]
    xn = _layernorm(x, ls_ref[0], lb_ref[0]).astype(cdtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b1_ref[0].astype(jnp.float32)
    h = _gelu(h, gelu).astype(cdtype)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "gelu", "interpret"))
def fused_ff_half(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    block_l: int = 512,
    gelu: str = "erf",
    interpret: bool = False,
) -> jax.Array:
    """x: (B, L, d) → x + FF(LN(x)); FF = Dense(4d) → GELU → Dense(d).
    ``gelu``: "erf" (exact, reference semantics) or "tanh" (see _gelu_tanh)."""
    B, L, d = x.shape
    ff = w1.shape[1]
    block_l = min(block_l, L)
    if L % block_l:
        raise ValueError(f"L={L} not divisible by block_l={block_l}")
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    single = pl.Buffered(buffer_count=1)
    tile = pl.BlockSpec(
        (1, block_l, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM,
    )
    const2 = lambda r, c: pl.BlockSpec(
        (r, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM,
        pipeline_mode=single,
    )
    vec = lambda c: pl.BlockSpec(
        (1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM,
        pipeline_mode=single,
    )

    return pl.pallas_call(
        functools.partial(_ff_kernel, precision=precision, gelu=gelu),
        grid=(B, L // block_l),
        in_specs=[
            tile,
            vec(d), vec(d),
            const2(d, ff), vec(ff),
            const2(ff, d), vec(d),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, L, d), x.dtype),
        interpret=interpret,
    )(x, ln_scale[None, :], ln_bias[None, :], w1, b1[None, :], w2, b2[None, :])
