"""Flax ESM2 encoder (protein tower of Stage-1 PenCL).

TPU-native re-implementation of fair-esm's ESM2 graph — the reference loads
``esm2_t33_650M_UR50D`` via ``esm.pretrained.load_model_and_alphabet``
(``Stage1_source/model.py:51-57``) and takes the CLS vector of representation
layer 33 (``model.py:59-76``).  Faithful details:

  * padding mask derived internally from ``tokens == pad_idx`` (the reference
    pipeline pads to 1024 with pad id 1 and passes no explicit mask —
    SURVEY.md Q3 — and fair-esm masks those keys itself),
  * token-dropout rescaling: masked-token embeddings zeroed, then the whole
    embedding scaled by (1 − 0.12)/(1 − observed mask ratio) — at inference
    with no <mask> tokens this is a constant ×0.88,
  * pre-LN transformer layers, rotary attention over the full head dim,
    f32 softmax, exact (erf) GELU,
  * final ``emb_layer_norm_after`` applied before representations are read —
    fair-esm reports the *last* repr layer post-norm,
  * tied-weight LM head (dense → gelu → LN → E^T + bias) for the MLM loss
    path (``compute_masked_lang_loss``, Stage1_source/model.py:401-465).

Returns both the final hidden states and (optionally) MLM logits.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from biom3_tpu.config import ESM2Config
from biom3_tpu.models.remat import remat_layer as _remat_layer
from biom3_tpu.ops.attention import full_attention
from biom3_tpu.ops.rotary import apply_rotary, rotary_cos_sin


class _ProjParams(nn.Module):
    """kernel/bias params with nn.Dense's exact names, shapes and inits —
    returned raw (not applied) so callers can fuse several projections into
    one matmul while keeping the checkpoint layout of separate Denses."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """LayerNorm scale/bias with nn.LayerNorm's names/inits, returned raw."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _AttnParams(nn.Module):
    """Raw q/k/v/out_proj kernels+biases under the ``self_attn`` scope —
    same checkpoint tree as ESM2SelfAttention, consumed by the fused
    layer-block kernel."""

    embed_dim: int

    @nn.compact
    def __call__(self):
        E = self.embed_dim
        wq, bq = _ProjParams(E, E, name="q_proj")()
        wk, bk = _ProjParams(E, E, name="k_proj")()
        wv, bv = _ProjParams(E, E, name="v_proj")()
        wo, bo = _ProjParams(E, E, name="out_proj")()
        return (jnp.stack([wq, wk, wv]), jnp.stack([bq, bk, bv]), wo, bo)


class ESM2SelfAttention(nn.Module):
    config: ESM2Config
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    mesh: object = None  # required for attn_impl="ring" (sequence parallel)

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: jax.Array) -> jax.Array:
        cfg = self.config
        B, L, E = x.shape
        H, Dh = cfg.attention_heads, cfg.head_dim

        # fused QKV: one (E, 3E) matmul.  _ProjParams keeps the param tree
        # identical to three nn.Dense modules (q_proj/kernel … v_proj/bias),
        # so converters/checkpoints are untouched; the weight concat is
        # 9.8 MB bf16/layer, negligible next to the GEMM it fuses.
        wq, bq = _ProjParams(E, E, name="q_proj")()
        wk, bk = _ProjParams(E, E, name="k_proj")()
        wv, bv = _ProjParams(E, E, name="v_proj")()
        w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
        b = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ w + b
        split = lambda z: z.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = (split(z) for z in jnp.split(qkv, 3, axis=-1))

        cos, sin = rotary_cos_sin(L, Dh, dtype=q.dtype)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        out = full_attention(q, k, v, padding_mask=padding_mask, impl=self.attn_impl, mesh=self.mesh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        return nn.Dense(E, use_bias=True, name="out_proj", dtype=self.dtype)(out)


class ESM2Layer(nn.Module):
    config: ESM2Config
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    mesh: object = None
    gelu: str = "erf"  # "tanh" = serving perf mode (366 ms/fwd cheaper at
                       # full size, B=16; drift recorded in tests/bench)

    def _dqkv_dtype(self, E: int, L: int):
        """dqkv backward-staging dtype for the layer-block kernels: forced
        by an explicit ``-bf16dq``/``-f32dq`` suffix, else auto — bf16 when
        the f32 (3E, L) staging buffer is ≥12 MB (the full-size regime
        whose f32 layout overflowed Mosaic's 120 MB scoped VMEM by 4.55 MB
        on chip; the bf16 buffer fits), f32 below it (tighter parity)."""
        if self.attn_impl.endswith("bf16dq"):
            return jnp.bfloat16
        if self.attn_impl.endswith("f32dq"):
            return jnp.float32
        return jnp.bfloat16 if 3 * E * L * 4 >= 12e6 else jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: jax.Array) -> jax.Array:
        cfg = self.config
        if self.attn_impl in ("layer-block", "layer-block-interpret",
                              "layer-block-bf16dq", "layer-block-f32dq",
                              "layer-block-interpret-bf16dq"):
            # whole-layer custom-VJP kernels (ops/pallas/esm2_block_tpu):
            # the Stage-1 training fast path — LN/rotary-attention/FF and
            # residuals fused, backward recomputes from the layer input
            # (so use remat=False; the kernel already saves only x).
            # Param tree identical to the Flax modules below.
            # dqkv backward staging dtype: plain "layer-block" auto-picks
            # bf16 when the f32 (3E, L) buffer would overflow Mosaic's
            # scoped VMEM — measured at full size (E=1280, L=1024,
            # 2026-08-19): f32 dqkv needs 124.55 MB > the 120 MB limit,
            # bf16 (−7.9 MB) fits.  "-bf16dq"/"-f32dq" force the choice.
            from biom3_tpu.ops.pallas.esm2_block_tpu import (
                NEG_INF, esm2_layer_block,
            )

            E = cfg.embed_dim
            ls1, lb1 = _LNParams(E, name="self_attn_layer_norm")()
            w3, b3, wo, bo = _AttnParams(E, name="self_attn")()
            ls2, lb2 = _LNParams(E, name="final_layer_norm")()
            w1, b1 = _ProjParams(E, cfg.ffn_dim, name="fc1")()
            w2, b2 = _ProjParams(cfg.ffn_dim, E, name="fc2")()
            padneg = padding_mask.astype(jnp.float32) * NEG_INF
            return esm2_layer_block(
                x.astype(self.dtype), padneg, w3, b3, wo, bo, ls1, lb1,
                ls2, lb2, w1, b1, w2, b2,
                heads=cfg.attention_heads, gelu=self.gelu,
                interpret="interpret" in self.attn_impl,
                dqkv_dtype=self._dqkv_dtype(E, x.shape[1]),
            )
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = x + ESM2SelfAttention(cfg, self.dtype, self.attn_impl, self.mesh, name="self_attn")(h, padding_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = nn.Dense(cfg.ffn_dim, name="fc1", dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=self.gelu == "tanh")
        h = nn.Dense(cfg.embed_dim, name="fc2", dtype=self.dtype)(h)
        return x + h


class ESM2(nn.Module):
    """forward(tokens (B, L) int32) → dict with "hidden" (B, L, E) — the
    post-final-norm representation (fair-esm repr layer = num_layers) — and
    "logits" (B, L, V) when ``compute_logits``."""

    config: ESM2Config
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    mesh: object = None  # for attn_impl="ring": long-protein sequence parallelism
    remat: bool | str = False  # rematerialize layers in the backward pass —
                         # fits full-size (650M) training on one 16 GB chip.
                         # "dots" keeps matmul outputs and recomputes only
                         # elementwise ops (jax dots_with_no_batch_dims
                         # policy): measured 356 -> 338 ms/step at B=4
                         # full-size (see models/remat.py)
    gelu: str = "erf"    # FF activation: "erf" = fair-esm parity,
                         # "tanh" = measured serving perf mode

    @nn.compact
    def __call__(self, tokens: jax.Array, *, compute_logits: bool = False) -> dict:
        cfg = self.config
        tokens = tokens.astype(jnp.int32)
        padding_mask = tokens == cfg.pad_idx  # (B, L)

        embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed_tokens")
        x = embed(tokens)

        if cfg.token_dropout:
            is_mask = tokens == cfg.mask_idx
            x = jnp.where(is_mask[..., None], 0.0, x)
            mask_ratio_train = 0.15 * 0.8
            src_lengths = jnp.sum(~padding_mask, axis=-1)
            mask_ratio_obs = jnp.sum(is_mask, axis=-1) / jnp.maximum(1, src_lengths)
            scale = (1.0 - mask_ratio_train) / (1.0 - mask_ratio_obs)
            x = x * scale[:, None, None].astype(x.dtype)

        x = x * (1.0 - padding_mask[..., None].astype(x.dtype))
        x = x.astype(self.dtype)

        layer_cls = _remat_layer(ESM2Layer, self.remat)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, self.dtype, self.attn_impl, self.mesh,
                          self.gelu, name=f"layers_{i}")(x, padding_mask)

        x = nn.LayerNorm(epsilon=1e-5, name="emb_layer_norm_after")(x)
        out = {"hidden": x}

        if compute_logits:
            h = nn.Dense(cfg.embed_dim, name="lm_head_dense", dtype=self.dtype)(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-5, name="lm_head_layer_norm")(h)
            # weight-tied output projection + per-token bias
            logits = h.astype(jnp.float32) @ embed.embedding.T.astype(jnp.float32)
            bias = self.param(
                "lm_head_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32
            )
            out["logits"] = logits + bias
        return out

    def cls_vector(self, variables, tokens) -> jax.Array:
        """CLS (position 0) of the final representation — the reference's
        protein embedding (Stage1_source/model.py:75)."""
        return self.apply(variables, tokens)["hidden"][:, 0, :]
