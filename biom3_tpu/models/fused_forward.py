"""Serving-path ProteoScribe forward built on the fused Pallas layer kernels.

Consumes the exact parameter pytree of ``models.proteoscribe.ProteoScribe``
(unrolled layers, ``layer_{block}_{idx}`` naming — the checkpoint layout the
converters produce) and computes the same logits with two Pallas kernels per
layer instead of ~18 XLA ops (see ``ops/pallas/fused_layer_tpu``).  This is
the TPU fast path for the sampling hot loop
(ref ``Stage3_source/sampling_analysis.py:204-265``); training and parity
(f32) paths keep the Flax module.

``make_fused_apply(cfg)`` returns ``fn(variables, x, t, z_c) → (B, L, C)``
— a drop-in for ``model.apply`` in ``diffusion.sampler.make_sampler`` /
the engines (deterministic only; no dropout on the serving path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import sinusoidal_time_embedding
from biom3_tpu.ops.pallas.fused_layer_tpu import fused_attn_half, fused_ff_half


def _cond_mlp(p, z):
    """ConditioningMLP: Dense → softplus → Dense (proteoscribe.py)."""
    h = z @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = jax.nn.softplus(h)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def final_head(cfg: ProteoScribeConfig, p, h):
    """final LayerNorm + Linear → C on any (..., d) hidden slice (lets the
    sampler gather its k positions BEFORE the head — no (B, L, C) logits
    materialization per denoise step)."""
    fn = p["final_norm"]
    hf = h.astype(jnp.float32)
    mean = hf.mean(-1, keepdims=True)
    var = ((hf - mean) ** 2).mean(-1, keepdims=True)
    hn = (hf - mean) * jax.lax.rsqrt(var + 1e-6)
    hn = hn * fn["scale"] + fn["bias"]
    return hn @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def time_bias_table(cfg: ProteoScribeConfig, p) -> jax.Array:
    """(T, dim·n_blocks·depth) additive bias for every timestep.  Depends
    only on params, so under a sampling scan XLA hoists it out of the loop —
    the per-step time-MLP collapses to one table row gather."""
    ts = jnp.arange(cfg.num_timesteps, dtype=jnp.int32)
    emb = sinusoidal_time_embedding(
        ts, cfg.dim, float(cfg.num_timesteps), cfg.rescale_steps
    )
    return _cond_mlp(p["time_mlp"], emb)


#: physical VMEM per TensorCore on the targeted generations (v4/v5e/v5p/v6e
#: all carry 128 MB); Mosaic needs some slack for spills/double-buffering.
_VMEM_PHYSICAL_MB = 128
_VMEM_SLACK_MB = 8


def plan_stack_kernel(
    cfg: ProteoScribeConfig,
    *,
    rows: int = 1,
    ff_buffers: int = 1,
    ff_block_l: int = 256,
    weight_bytes: int = 2,
    vmem_mb: int = _VMEM_PHYSICAL_MB,
    gather_k: int = 8,
) -> dict:
    """Decide how (whether) the whole-stack kernel can serve ``cfg``.

    Returns ``{"supported", "resident", "vmem_limit_mb", "reason"}``:
    ``supported=False`` → fall back to the per-layer fused kernels or the
    Flax/XLA graph; otherwise ``resident`` says whether all ``depth``
    layers' weights fit VMEM at once (one 96 MB-class prefetch per call)
    or must stream per layer (``grid=(B/rows, depth)``).

    The budget mirrors ``fused_stack_logits``'s allocation: stacked layer
    weights (q/k/v/out + 2 FF mats = ``(4 + 8·ff_mult/4)·d²`` elements per
    layer), constant tables, the (rows, L, d) residual scratch, and the f32
    working set of one layer body (dominated by the FF hidden chunk and the
    local-attention strips).  Generalizes the kernel beyond the published
    shape class — BACKLOG #7.
    """
    d, L = cfg.dim, cfg.max_seq_len
    ff = 4 * d
    mb = 1024 * 1024

    shape_bar = None
    if cfg.n_blocks != 1:
        shape_bar = f"n_blocks={cfg.n_blocks} (kernel assumes a single block)"
    elif d % cfg.heads or d % 128 or L % 128:
        shape_bar = (f"dim={d}/heads={cfg.heads}/L={L} not MXU-tileable "
                     "(need d%heads==0, d%128==0, L%128==0)")
    elif L % cfg.local_window:
        shape_bar = f"L={L} not divisible by window={cfg.local_window}"

    def _plan(supported, resident, limit, reason):
        return {
            "supported": supported and shape_bar is None,
            "resident": resident,
            "vmem_limit_mb": int(limit),
            "reason": shape_bar or reason,
        }

    per_layer_w = (4 * d * d + 2 * d * ff) * weight_bytes
    const = (cfg.num_classes * d + L * d + d * cfg.num_classes) * weight_bytes
    scratch = rows * L * d * 2  # bf16 residual stream
    # f32 working set of one layer body (one row): residual xb + LN copy,
    # transposed q/k/t activations (3 d×L bf16), FF hidden chunk, local
    # attention dot strips (nl, W, 3W) f32
    nl = cfg.local_heads
    work = (
        2 * (L * d * 4)
        + 3 * (L * d * 2)
        + ff_block_l * ff * 4
        + nl * cfg.local_window * 3 * cfg.local_window * 4
    )
    # decode gather + head at k positions per row: (k, L) one-hot f32,
    # (k, d) gathered residual, (k, C) logits.  k = positions_per_step for
    # path-ordered sampling but k = L for confidence ordering (which needs
    # the full logit grid) — at L=1024 that is ~6 MB/row the original
    # budget never modeled.
    work += rows * gather_k * (L + d + cfg.num_classes) * 4
    budget = (vmem_mb - _VMEM_SLACK_MB) * mb

    resident_total = cfg.depth * per_layer_w + const + scratch + work
    if resident_total <= budget:
        return _plan(True, True, min(vmem_mb - _VMEM_SLACK_MB,
                                     (resident_total // mb) + 16),
                     f"resident: {resident_total // mb} MB of {vmem_mb} MB")

    stream_total = (1 + ff_buffers) * per_layer_w + const + scratch + work
    if stream_total <= budget:
        return _plan(True, False, min(vmem_mb - _VMEM_SLACK_MB,
                                      (stream_total // mb) + 16),
                     f"streamed: {stream_total // mb} MB/layer-step of "
                     f"{vmem_mb} MB (resident needs "
                     f"{resident_total // mb} MB)")

    return _plan(False, False, 0,
                 f"one layer's working set ({stream_total // mb} MB) "
                 f"exceeds VMEM ({vmem_mb} MB)")


def make_stack_apply(
    cfg: ProteoScribeConfig,
    *,
    dtype=jnp.bfloat16,
    conditional: bool = True,
    rows: int = 1,
    ff_buffers: int = 1,
    gelu: str = "erf",
    resident: bool | None = None,
    stream: str = "ld",
    ff_block_l: int = 256,
    vmem_limit_mb: int | None = None,
    interpret: bool = False,
    ff_quant: str = "none",
    proj_quant: str = "none",
    softmax_opt: bool = False,
    ln_onepass: bool = False,
    ablate: str = "",
    local_impl: str = "strips",
    attn_quant: str = "none",
    gather_k: int = 8,
):
    """Whole-stack serving forward (``ops/pallas/stack_kernel_tpu``): ONE
    Pallas call per model call — embedding, all layers, and the output head
    at the decode positions, with the residual stream resident in VMEM.

    Returns ``fn(variables, x (B,L) int, t (B,) int, z_c, pos (B,k) int)
    → (B, k, C) f32`` — the sampler's ``apply_takes_positions`` contract.
    All parameter packing (stacking per-layer weights to (depth, …),
    transposing the bias table) is loop-invariant, so XLA hoists it out of
    the sampling scan.

    ``resident=None`` resolves weight residency (and the VMEM limit) from
    ``plan_stack_kernel`` — all-layers-resident when the stacked weights
    fit VMEM, per-layer streaming otherwise; raises for configs the kernel
    cannot tile (callers gate on the plan instead, see the engine).

    ``ff_quant='int8'`` runs the FF matmuls (2/3 of layer FLOPs) on the
    MXU's int8 path: per-out-channel weight quant (packed here, hoisted
    out of sampling scans) × in-kernel dynamic per-token activation quant
    (``ops/pallas/quant``).  ``proj_quant='int8'`` extends that to the
    q/k/v/out projections (the remaining 1/3; attention dots/softmaxes
    stay bf16/f32).  Drift-gated in bench against the bf16 kernel.
    """
    from biom3_tpu.ops.pallas.quant import quantize_weight_int8
    from biom3_tpu.ops.pallas.stack_kernel_tpu import fused_stack_logits

    plan = plan_stack_kernel(cfg, rows=rows, ff_buffers=ff_buffers,
                             ff_block_l=ff_block_l, gather_k=gather_k)
    # interpret mode (CPU emulation for tests) has no tiling/VMEM limits
    if not plan["supported"] and not interpret:
        raise ValueError(f"stack kernel cannot serve this config: "
                         f"{plan['reason']}")
    if resident is None:
        resident = plan["resident"]
    if not resident and ff_buffers == 1:
        # streamed path: double-buffer the FF weight stream when the plan
        # affords it — on-chip A/B (tools/exp_kernels.py --which streamed,
        # 2026-08-19, B=32): single-buffered streaming costs +15% vs the
        # resident kernel (26.43 vs 23.07 ms/call); with ff_buffers=2 the
        # DMA overlap hides streaming entirely (22.98 ms/call)
        plan2 = plan_stack_kernel(cfg, rows=rows, ff_buffers=2,
                                  ff_block_l=ff_block_l, gather_k=gather_k)
        if plan2["supported"] and not plan2["resident"]:
            plan, ff_buffers = plan2, 2
    depth = cfg.depth

    def apply_fn(variables, x, t, z_c=None, pos=None, **_ignored):
        if pos is None:
            raise ValueError("stack apply requires decode positions")
        p = variables["params"] if "params" in variables else variables
        B, L = x.shape

        # (T, depth, d) time-bias table — one gather per step under the scan
        table = time_bias_table(cfg, p).reshape(
            cfg.num_timesteps, cfg.dim, depth
        ).transpose(0, 2, 1)
        bias = jnp.take(table, t, axis=0)                   # (B, depth, d)
        if conditional:
            if z_c is None:
                raise ValueError("conditional model requires z_c")
            yb = _cond_mlp(p["y_mlp"], z_c).reshape(
                z_c.shape[0], cfg.dim, depth
            ).transpose(0, 2, 1)
            bias = bias + yb

        pos_emb = (
            p["ax_row"][:, None, :] + p["ax_col"][None, :, :]
        ).reshape(cfg.max_seq_len, cfg.dim)[:L].astype(dtype)

        def stack(getter):
            return jnp.stack([getter(p[f"layer_0_{li}"]) for li in range(depth)])

        if ff_quant == "int8":
            w1, s1 = quantize_weight_int8(stack(lambda lp: lp["ff_w1"]["kernel"]))
            w2, s2 = quantize_weight_int8(stack(lambda lp: lp["ff_w2"]["kernel"]))
        else:
            w1 = stack(lambda lp: lp["ff_w1"]["kernel"]).astype(dtype)
            w2 = stack(lambda lp: lp["ff_w2"]["kernel"]).astype(dtype)
            s1 = s2 = None

        if proj_quant == "int8":
            wq, sq = quantize_weight_int8(stack(lambda lp: lp["attn"]["to_q_kernel"]))
            wk, sk = quantize_weight_int8(stack(lambda lp: lp["attn"]["to_k_kernel"]))
            wv, sv = quantize_weight_int8(stack(lambda lp: lp["attn"]["to_v_kernel"]))
            wo, so = quantize_weight_int8(stack(lambda lp: lp["attn"]["to_out"]["kernel"]))
        else:
            wq = stack(lambda lp: lp["attn"]["to_q_kernel"]).astype(dtype)
            wk = stack(lambda lp: lp["attn"]["to_k_kernel"]).astype(dtype)
            wv = stack(lambda lp: lp["attn"]["to_v_kernel"]).astype(dtype)
            wo = stack(lambda lp: lp["attn"]["to_out"]["kernel"]).astype(dtype)
            sq = sk = sv = so = None

        return fused_stack_logits(
            x.astype(jnp.int32), pos.astype(jnp.int32), bias,
            p["tok_emb"]["embedding"].astype(dtype), pos_emb,
            stack(lambda lp: lp["attn_norm"]["scale"]),
            stack(lambda lp: lp["attn_norm"]["bias"]),
            wq, wk, wv, wo,
            stack(lambda lp: lp["attn"]["to_out"]["bias"]),
            stack(lambda lp: lp["ff_norm"]["scale"]),
            stack(lambda lp: lp["ff_norm"]["bias"]),
            w1,
            stack(lambda lp: lp["ff_w1"]["bias"]),
            w2,
            stack(lambda lp: lp["ff_w2"]["bias"]),
            p["final_norm"]["scale"], p["final_norm"]["bias"],
            p["out_proj"]["kernel"].astype(dtype), p["out_proj"]["bias"],
            s1, s2, sq, sk, sv, so,
            local_heads=cfg.local_heads, heads=cfg.heads,
            window=cfg.local_window, rows=rows, ff_buffers=ff_buffers,
            gelu=gelu, resident=resident, stream=stream,
            ff_block_l=ff_block_l, ff_quant=ff_quant, proj_quant=proj_quant,
            softmax_opt=softmax_opt, ln_onepass=ln_onepass, ablate=ablate,
            local_impl=local_impl, attn_quant=attn_quant,
            vmem_limit_mb=(vmem_limit_mb if vmem_limit_mb is not None
                           else plan["vmem_limit_mb"]),
            interpret=interpret,
        )

    return apply_fn


def make_sharded_stack_apply(cfg: ProteoScribeConfig, mesh, **kwargs):
    """Multi-chip twin of :func:`make_stack_apply`: the whole-stack kernel
    under ``jax.shard_map`` over the mesh's (dp, fsdp) batch axes — each
    device runs the fused kernel on its batch shard, params replicated.
    No collectives are needed (denoising is embarrassingly batch-parallel),
    so scale-out efficiency is linear by construction; pair with
    ``pipeline.sweep.SweepRunner(..., apply_takes_positions=True)``.

    ``check_vma=False``: pallas_call outputs carry no varying-mesh-axes
    annotation yet; correctness is covered by
    ``tests/test_sweep.py::test_sweep_runner_sharded_stack_kernel``.
    """
    from jax.sharding import PartitionSpec as P

    apply_fn = make_stack_apply(cfg, **kwargs)
    data = P(("dp", "fsdp"))

    def sharded(variables, x, t, z_c=None, pos=None, **_ignored):
        return jax.shard_map(
            lambda v, x, t, z, p: apply_fn(v, x, t, z, p),
            mesh=mesh,
            in_specs=(P(), data, data, data, data),
            out_specs=data,
            check_vma=False,
        )(variables, x, t, z_c, pos)

    return sharded


def make_fused_apply(
    cfg: ProteoScribeConfig,
    *,
    dtype=jnp.bfloat16,
    conditional: bool = True,
    interpret: bool = False,
    time_table: bool = True,
    return_hidden: bool = False,
    gelu: str = "erf",
):
    """``time_table`` trades a (T, dim·layers) precompute (loop-invariant,
    hoisted out of sampling scans) for the per-step time-MLP.
    ``return_hidden`` skips the final norm+head — pair with ``final_head``
    (the sampler's gather-before-head path)."""

    def apply_fn(variables, x, t, z_c=None, **_ignored):
        p = variables["params"] if "params" in variables else variables
        B, L = x.shape

        tok = jnp.take(p["tok_emb"]["embedding"], x.astype(jnp.int32), axis=0)
        pos = (
            p["ax_row"][:, None, :] + p["ax_col"][None, :, :]
        ).reshape(cfg.max_seq_len, cfg.dim)[None, :L, :]
        x_embed = (tok + pos).astype(dtype)

        if time_table:
            bias_flat = jnp.take(time_bias_table(cfg, p), t, axis=0)
        else:
            t_emb = sinusoidal_time_embedding(
                t, cfg.dim, float(cfg.num_timesteps), cfg.rescale_steps
            )
            bias_flat = _cond_mlp(p["time_mlp"], t_emb)
        if conditional:
            if z_c is None:
                raise ValueError("conditional model requires z_c")
            bias_flat = bias_flat + _cond_mlp(p["y_mlp"], z_c)
        # (B, dim, n_blocks, depth) — same layout as the Flax model
        biases = bias_flat.reshape(B, cfg.dim, cfg.n_blocks, cfg.depth)

        h = jnp.zeros_like(x_embed)
        for bi in range(cfg.n_blocks):
            h = h + x_embed
            for li in range(cfg.depth):
                lp = p[f"layer_{bi}_{li}"]
                ap = lp["attn"]
                h = fused_attn_half(
                    h,
                    biases[:, :, bi, li].astype(dtype),
                    lp["attn_norm"]["scale"], lp["attn_norm"]["bias"],
                    ap["to_q_kernel"].astype(dtype),
                    ap["to_k_kernel"].astype(dtype),
                    ap["to_v_kernel"].astype(dtype),
                    ap["to_out"]["kernel"].astype(dtype),
                    ap["to_out"]["bias"],
                    local_heads=cfg.local_heads, heads=cfg.heads,
                    window=cfg.local_window, interpret=interpret,
                )
                h = fused_ff_half(
                    h,
                    lp["ff_norm"]["scale"], lp["ff_norm"]["bias"],
                    lp["ff_w1"]["kernel"].astype(dtype), lp["ff_w1"]["bias"],
                    lp["ff_w2"]["kernel"].astype(dtype), lp["ff_w2"]["bias"],
                    gelu=gelu, interpret=interpret,
                )

        if return_hidden:
            return h
        return final_head(cfg, p, h)

    return apply_fn
