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


def make_stack_apply(
    cfg: ProteoScribeConfig,
    *,
    dtype=jnp.bfloat16,
    conditional: bool = True,
    rows: int = 1,
    ff_buffers: int = 1,
    gelu: str = "erf",
    resident: bool = True,
    ff_block_l: int = 256,
    vmem_limit_mb: int | None = None,
    interpret: bool = False,
):
    """Whole-stack serving forward (``ops/pallas/stack_kernel_tpu``): ONE
    Pallas call per model call — embedding, all layers, and the output head
    at the decode positions, with the residual stream resident in VMEM.

    Returns ``fn(variables, x (B,L) int, t (B,) int, z_c, pos (B,k) int)
    → (B, k, C) f32`` — the sampler's ``apply_takes_positions`` contract.
    All parameter packing (stacking per-layer weights to (depth, …),
    transposing the bias table) is loop-invariant, so XLA hoists it out of
    the sampling scan.  Requires ``n_blocks == 1`` (the reference config).
    """
    from biom3_tpu.ops.pallas.stack_kernel_tpu import fused_stack_logits

    if cfg.n_blocks != 1:
        raise ValueError("stack kernel supports n_blocks=1 (reference config)")
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

        return fused_stack_logits(
            x.astype(jnp.int32), pos.astype(jnp.int32), bias,
            p["tok_emb"]["embedding"].astype(dtype), pos_emb,
            stack(lambda lp: lp["attn_norm"]["scale"]),
            stack(lambda lp: lp["attn_norm"]["bias"]),
            stack(lambda lp: lp["attn"]["to_q_kernel"]).astype(dtype),
            stack(lambda lp: lp["attn"]["to_k_kernel"]).astype(dtype),
            stack(lambda lp: lp["attn"]["to_v_kernel"]).astype(dtype),
            stack(lambda lp: lp["attn"]["to_out"]["kernel"]).astype(dtype),
            stack(lambda lp: lp["attn"]["to_out"]["bias"]),
            stack(lambda lp: lp["ff_norm"]["scale"]),
            stack(lambda lp: lp["ff_norm"]["bias"]),
            stack(lambda lp: lp["ff_w1"]["kernel"]).astype(dtype),
            stack(lambda lp: lp["ff_w1"]["bias"]),
            stack(lambda lp: lp["ff_w2"]["kernel"]).astype(dtype),
            stack(lambda lp: lp["ff_w2"]["bias"]),
            p["final_norm"]["scale"], p["final_norm"]["bias"],
            p["out_proj"]["kernel"].astype(dtype), p["out_proj"]["bias"],
            local_heads=cfg.local_heads, heads=cfg.heads,
            window=cfg.local_window, rows=rows, ff_buffers=ff_buffers,
            gelu=gelu, resident=resident, ff_block_l=ff_block_l,
            vmem_limit_mb=(vmem_limit_mb if vmem_limit_mb is not None
                           else (120 if resident else 40)),
            interpret=interpret,
        )

    return apply_fn


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
