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


def make_fused_apply(
    cfg: ProteoScribeConfig,
    *,
    dtype=jnp.bfloat16,
    conditional: bool = True,
    interpret: bool = False,
    time_table: bool = True,
    return_hidden: bool = False,
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
                    interpret=interpret,
                )

        if return_hidden:
            return h
        return final_head(cfg, p, h)

    return apply_fn
