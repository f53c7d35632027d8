"""Stage-3 ProteoScribe: conditional any-order discrete-diffusion transformer.

TPU-native re-design of the reference graph
(``Stage3_source/cond_diff_transformer_layer.py:47-176``):

  * token embedding (29 → 512) + axial positional embedding factorized as two
    learned tables (L/W, dim) + (W, dim) summed (the lucidrains
    ``AxialPositionalEmbedding`` with axial_shape=(8,128), summed mode),
  * sinusoidal time embedding (rescale 4000) → MLP → one 512-d bias per layer,
  * conditioning z_c (512) → MLP → one 512-d bias per layer,
  * ``depth`` pre-norm transformer layers, each with 16 heads split
    8 local-window (W=128, ±1 window) + 8 global linear-attention heads,
    followed by a pre-norm FF (512→2048→512, exact GELU),
  * final LayerNorm + Linear → 29 logits.

The reference stacks 16 *depth-1* ``LinearAttentionTransformer`` modules and
adds the per-layer time/cond biases between them; here the whole stack is a
single scanned/unrolled Flax module.  Layer math matches
``linear_attention_transformer==0.19.1`` exactly (q/k/v projections without
bias, output projection with bias, residuals applied outside pre-norm).

Output logits are returned as (B, L, C) — the natural TPU layout.  Use
``logits.transpose(0, 2, 1)`` for the reference's (B, C, L) convention.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention


def sinusoidal_time_embedding(
    t: jax.Array, dim: int, num_steps: float, rescale_steps: float = 4000.0
) -> jax.Array:
    """Time embedding; ref SinusoidalPosEmb (cond_diff_transformer_layer.py:10-42)."""
    t = t.astype(jnp.float32) / num_steps * rescale_steps
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    ang = t[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class _LNParams(nn.Module):
    """LayerNorm scale/bias with nn.LayerNorm's names/inits, returned raw."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """kernel/bias with nn.Dense's names/shapes/inits, returned raw."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _SplitAttnParams(nn.Module):
    """SplitHeadAttention's param tree (to_{q,k,v}_kernel + to_out Dense),
    returned raw for the whole-layer kernel."""

    config: ProteoScribeConfig

    @nn.compact
    def __call__(self):
        d = self.config.dim
        kernel = lambda name: self.param(
            name, nn.initializers.lecun_normal(), (d, d), jnp.float32
        )
        wq, wk, wv = (
            kernel("to_q_kernel"), kernel("to_k_kernel"), kernel("to_v_kernel")
        )
        wo, bo = _DenseParams(d, d, name="to_out")()
        return {"wq": wq, "wk": wk, "wv": wv, "wo": wo, "bo": bo}


class _OutProjParams(nn.Module):
    """kernel/bias params with nn.Dense's exact names, shapes and inits —
    returned raw so the fused attention block can consume them while the
    checkpoint tree stays identical to an nn.Dense("to_out")."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SplitHeadAttention(nn.Module):
    """16-head self-attention: first ``local_heads`` heads use windowed
    attention, the rest use linear attention (head order matters for weight
    conversion; lucidrains splits q/k/v with local heads first)."""

    config: ProteoScribeConfig
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        B, L, _ = x.shape
        H, Dh = cfg.heads, cfg.head_dim

        # q/k/v kernels stay separate params (checkpoint layout unchanged);
        # with fused_qkv the three kernels are concatenated into one
        # (dim, 3·dim) matmul — the concat is loop-invariant, so XLA hoists
        # it out of the sampling scan.
        def kernel(name):
            return self.param(
                name, nn.initializers.lecun_normal(), (cfg.dim, cfg.dim),
                jnp.float32,
            )

        wq, wk, wv = kernel("to_q_kernel"), kernel("to_k_kernel"), kernel("to_v_kernel")
        xc = x.astype(self.dtype)
        if self.attn_impl in ("block", "block-interpret"):
            # training-path fused attention block with a custom VJP
            # (ops/pallas/attn_block_tpu): projections + local + linear +
            # out-proj in one kernel per direction, flash-style recompute
            # in the backward.  Raw to_out params keep nn.Dense's exact
            # tree (checkpoint layout unchanged).
            from biom3_tpu.ops.pallas.attn_block_tpu import (
                split_attention_block,
            )

            wo_kernel, wo_bias = _OutProjParams(cfg.dim, name="to_out")()
            out = split_attention_block(
                xc, wq.astype(self.dtype), wk.astype(self.dtype),
                wv.astype(self.dtype), wo_kernel, wo_bias,
                local_heads=cfg.local_heads, heads=H,
                window=cfg.local_window,
                interpret=self.attn_impl == "block-interpret",
            )
            return nn.Dropout(
                cfg.attn_layer_dropout, deterministic=deterministic
            )(out)
        if self.fused_qkv:
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            q, k, v = jnp.split(xc @ w, 3, axis=-1)
        else:
            q = xc @ wq.astype(self.dtype)
            k = xc @ wk.astype(self.dtype)
            v = xc @ wv.astype(self.dtype)
        split = lambda z: z.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        nl = cfg.local_heads
        outs = []
        if nl > 0:
            outs.append(
                local_window_attention(
                    q[:, :nl], k[:, :nl], v[:, :nl],
                    window=cfg.local_window, impl=self.attn_impl,
                )
            )
        if cfg.global_heads > 0:
            outs.append(linear_attention(q[:, nl:], k[:, nl:], v[:, nl:]))
        out = jnp.concatenate(outs, axis=1)  # (B, H, L, Dh), local heads first
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.dim)
        out = nn.Dense(cfg.dim, use_bias=True, name="to_out", dtype=self.dtype)(out)
        # lucidrains SelfAttention ends with Dropout(attn_layer_dropout) on
        # the output projection (get_model passes input_dp_rate there,
        # cond_diff_transformer_layer.py:236)
        return nn.Dropout(cfg.attn_layer_dropout, deterministic=deterministic)(out)


class TransformerLayer(nn.Module):
    """Pre-norm attention + pre-norm FF with residuals
    (linear_attention_transformer SequentialSequence semantics)."""

    config: ProteoScribeConfig
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        if self.attn_impl in ("layer-block", "layer-block-interpret"):
            # whole-layer custom-VJP kernel (ops/pallas/layer_block_tpu):
            # both LNs, attention, GELU FF and residuals in one kernel per
            # direction.  Zero-dropout path only (published config) — the
            # Flax graph remains the fallback for dropout > 0 training.
            if not deterministic and (
                cfg.attn_layer_dropout > 0 or cfg.ff_dropout > 0
            ):
                raise ValueError(
                    "layer-block kernel has no dropout path; use "
                    "attn_impl='xla' for nonzero-dropout training"
                )
            from biom3_tpu.ops.pallas.layer_block_tpu import (
                transformer_layer_block,
            )

            ln1 = _LNParams(cfg.dim, name="attn_norm")()
            attn_p = _SplitAttnParams(cfg, name="attn")()
            ln2 = _LNParams(cfg.dim, name="ff_norm")()
            w1, b1 = _DenseParams(cfg.dim, cfg.dim * cfg.ff_mult,
                                  name="ff_w1")()
            w2, b2 = _DenseParams(cfg.dim * cfg.ff_mult, cfg.dim,
                                  name="ff_w2")()
            return transformer_layer_block(
                x.astype(self.dtype),
                attn_p["wq"], attn_p["wk"], attn_p["wv"],
                attn_p["wo"], attn_p["bo"],
                ln1[0], ln1[1], ln2[0], ln2[1], w1, b1, w2, b2,
                local_heads=cfg.local_heads, heads=cfg.heads,
                window=cfg.local_window,
                interpret=self.attn_impl == "layer-block-interpret",
            )
        h = nn.LayerNorm(name="attn_norm")(x)  # norms accumulate in f32
        x = x + SplitHeadAttention(
            cfg, self.attn_impl, self.dtype, self.fused_qkv, name="attn"
        )(h, deterministic=deterministic)
        h = nn.LayerNorm(name="ff_norm")(x)
        h = nn.Dense(cfg.dim * cfg.ff_mult, name="ff_w1", dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        # lucidrains FeedForward: dropout sits between activation and w2
        h = nn.Dropout(cfg.ff_dropout, deterministic=deterministic)(h)
        h = nn.Dense(cfg.dim, name="ff_w2", dtype=self.dtype)(h)
        return x + h


class _ScanBody(nn.Module):
    """TransformerLayer wrapped for ``nn.scan``: carry = h, xs = per-layer bias."""

    config: ProteoScribeConfig
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    fused_qkv: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, h: jax.Array, bias: jax.Array):
        h = TransformerLayer(
            self.config, self.attn_impl, self.dtype, self.fused_qkv,
            name="layer",
        )(h + bias[:, None, :], deterministic=self.deterministic)
        return h, None


class ConditioningMLP(nn.Module):
    """512 → 4·512 → softplus → dim · n_layers (per-layer additive biases);
    ref y_mlp / time mlp (cond_diff_transformer_layer.py:93-105)."""

    config: ProteoScribeConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        n_layers = cfg.n_blocks * cfg.depth
        h = nn.Dense(cfg.dim * 4, name="fc1")(z)
        h = jax.nn.softplus(h)
        h = nn.Dense(cfg.dim * n_layers, name="fc2")(h)
        return h.reshape(*z.shape[:-1], cfg.dim, cfg.n_blocks, cfg.depth)


class ProteoScribe(nn.Module):
    """forward(x (B,L) int, t (B,) int, z_c (B,cond_dim)) → logits (B,L,C).

    ``conditional=False`` builds the reference's unconditional variant
    (``Stage3_source/diff_transformer_layer.py:145-168`` — same graph minus
    the ``y_mlp`` conditioning; its dead ``Rezero`` module :170-177 is
    intentionally not reproduced).  Call with ``z_c=None`` in that mode.
    """

    config: ProteoScribeConfig
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    conditional: bool = True
    fused_qkv: bool = False
    remat: bool = False        # rematerialize layers in the backward pass
    scan_layers: bool = False  # lax.scan over depth (stacked params; ~depth×
                               # smaller HLO → much faster compiles)
    scan_unroll: int = 1       # unroll factor inside the layer scan — trades
                               # compile size back for cross-layer fusion
                               # (BACKLOG: plain scan runs ~50% slower)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        z_c: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        B, L = x.shape

        tok = nn.Embed(cfg.num_classes, cfg.dim, name="tok_emb")(x.astype(jnp.int32))

        # axial positional embedding: two summed tables (ref axial_shape=(L/W, W))
        n_rows = cfg.max_seq_len // cfg.local_window
        ax_row = self.param(
            "ax_row", nn.initializers.normal(1.0), (n_rows, cfg.dim), jnp.float32
        )
        ax_col = self.param(
            "ax_col", nn.initializers.normal(1.0), (cfg.local_window, cfg.dim), jnp.float32
        )
        pos = (ax_row[:, None, :] + ax_col[None, :, :]).reshape(cfg.max_seq_len, cfg.dim)
        x_embed = tok + pos[None, :L, :].astype(tok.dtype)

        t_emb = sinusoidal_time_embedding(
            t, cfg.dim, float(cfg.num_timesteps), cfg.rescale_steps
        )
        time_bias = ConditioningMLP(cfg, name="time_mlp")(t_emb)   # (B, dim, nb, depth)
        if self.conditional:
            if z_c is None:
                raise ValueError("conditional model requires z_c")
            time_bias = time_bias + ConditioningMLP(cfg, name="y_mlp")(z_c)

        h = jnp.zeros_like(x_embed)
        if self.scan_layers:
            import os as _os

            if (not self.remat and jax.default_backend() not in ("cpu",)
                    and not _os.environ.get("BIOM3_ALLOW_COMPILER_KILLERS")):
                # The backward graph of a plain (un-remat'd) layer scan
                # crashes the remote TPU compiler (HTTP 500).  The minimal
                # repro (tools/repro_compiler_crashes.py --which scan_bwd)
                # PASSES on the 2026-08-19+ backend, but the FULL-SIZE
                # training graph (B=32, reference config) still 500s —
                # re-confirmed 2026-08-20 via tools/bench_train.py
                # --variants scan_u1 scan_u2.  Keep this a loud warning;
                # re-test per backend change.
                import warnings as _warnings

                _warnings.warn(
                    "scan_layers=True without remat: the TRAINING BACKWARD "
                    "graph of this configuration crashes the remote TPU "
                    "compiler (HTTP 500) at full size (B=32 reference "
                    "config, re-confirmed 2026-08-20; the minimal "
                    "tools/repro_compiler_crashes.py scan_bwd case passes). "
                    "Forward-only inference is unaffected.  For training "
                    "set remat=True (CLI: --layer-mode scan_remat) or use "
                    "an unrolled mode; re-test with tools/bench_train.py "
                    "--variants scan_u1 after backend upgrades",
                    stacklevel=2,
                )
            body = _ScanBody
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scanner = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=cfg.depth,
                unroll=self.scan_unroll,
            )
            for bi in range(cfg.n_blocks):
                h = h + x_embed
                # (B, dim, depth) → xs stacked on axis 0: (depth, B, dim)
                biases = jnp.moveaxis(time_bias[..., bi, :], -1, 0)
                h, _ = scanner(
                    cfg, self.attn_impl, self.dtype, self.fused_qkv,
                    deterministic, name=f"block_{bi}",
                )(h, biases)
        else:
            layer_cls = (
                # deterministic (call arg 2; 0 is the module) is a static bool
                nn.remat(TransformerLayer, static_argnums=(2,))
                if self.remat
                else TransformerLayer
            )
            for bi in range(cfg.n_blocks):
                h = h + x_embed
                for li in range(cfg.depth):
                    bias = time_bias[..., bi, li]  # (B, dim)
                    h = layer_cls(
                        cfg, self.attn_impl, self.dtype, self.fused_qkv,
                        name=f"layer_{bi}_{li}",
                    )(h + bias[:, None, :], deterministic)

        h = nn.LayerNorm(name="final_norm")(h)
        return nn.Dense(cfg.num_classes, name="out_proj")(h)
