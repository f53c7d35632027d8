"""Flax BERT encoder + MLM head (text tower of Stage-1 PenCL).

Faithful re-implementation of HF ``BertForMaskedLM`` as used by the reference
(``Stage1_source/model.py:91-132`` — PubMedBERT-base).  Parity-relevant
details:

  * the reference calls the model with **no attention mask**
    (``model.py:124,129`` pass only input_ids), so attention runs over PAD
    tokens; we default to the same, with an optional mask argument for the
    framework's batched pipelines,
  * post-LN ("BERT-style") residual blocks, learned absolute positions,
    token-type-0 embeddings, LayerNorm eps 1e-12, exact GELU,
  * z_t = last hidden state's CLS (position 0) (``model.py:129-132``),
  * MLM head: transform dense → gelu → LN → decoder tied to word embeddings
    plus output bias (the ``compute_masked_lang_loss`` path).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from biom3_tpu.config import BertConfig
from biom3_tpu.ops.attention import full_attention


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        padding_mask: jax.Array | None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        B, L, E = x.shape
        H = cfg.num_heads
        Dh = E // H
        dense = lambda name: nn.Dense(E, name=name, dtype=self.dtype)
        q, k, v = dense("query")(x), dense("key")(x), dense("value")(x)
        split = lambda z: z.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        if not deterministic and cfg.attn_probs_dropout > 0.0:
            # HF applies Dropout to the softmax probabilities
            # (attention_probs_dropout_prob); inline attention so the probs
            # are visible — train mode only, inference keeps the fused paths.
            prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                    else None)
            logits = jnp.einsum(
                "...id,...jd->...ij", q, k, precision=prec,
                preferred_element_type=jnp.float32,
            ) * (Dh ** -0.5)
            if padding_mask is not None:
                logits = jnp.where(padding_mask[..., None, None, :], -1e9, logits)
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(cfg.attn_probs_dropout, deterministic=False)(probs)
            out = jnp.einsum(
                "...ij,...jd->...id", probs.astype(v.dtype), v,
                precision=prec,
            )
        else:
            out = full_attention(q, k, v, padding_mask=padding_mask, impl=self.attn_impl)
        return out.transpose(0, 2, 1, 3).reshape(B, L, E)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        padding_mask: jax.Array | None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        eps = cfg.layer_norm_eps
        drop = lambda z: nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(z)
        attn = BertSelfAttention(cfg, self.dtype, self.attn_impl, name="attention")(
            x, padding_mask, deterministic
        )
        attn = nn.Dense(cfg.hidden_size, name="attention_output", dtype=self.dtype)(attn)
        # HF BertSelfOutput/BertOutput: Dense → Dropout → residual → LayerNorm
        x = nn.LayerNorm(epsilon=eps, name="attention_norm")(x + drop(attn))
        h = nn.Dense(cfg.intermediate_size, name="intermediate", dtype=self.dtype)(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output", dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=eps, name="output_norm")(x + drop(h))


class BertEncoder(nn.Module):
    """forward(input_ids (B, L)) → {"hidden": (B, L, E) last layer,
    "logits": (B, L, V) MLM logits when compute_logits}."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool | str = False  # False / True (full) / "dots" (models.remat)

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        *,
        attention_mask: jax.Array | None = None,
        compute_logits: bool = False,
        deterministic: bool = True,
    ) -> dict:
        cfg = self.config
        input_ids = input_ids.astype(jnp.int32)
        B, L = input_ids.shape
        eps = cfg.layer_norm_eps

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings")

        x = (
            word(input_ids)
            + pos(jnp.arange(L, dtype=jnp.int32))[None, :, :]
            + typ(jnp.zeros_like(input_ids))
        )
        x = nn.LayerNorm(epsilon=eps, name="embeddings_norm")(x).astype(self.dtype)
        # HF BertEmbeddings ends with Dropout(hidden_dropout_prob)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(x)

        # reference passes no attention mask (model.py:124,129): attends PADs.
        padding_mask = None
        if attention_mask is not None:
            padding_mask = attention_mask == 0

        # deterministic (call arg 3; 0 is the module) is a static bool
        from biom3_tpu.models.remat import remat_layer

        layer_cls = remat_layer(BertLayer, self.remat, static_argnums=(3,))
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, self.dtype, self.attn_impl, name=f"layer_{i}")(
                x, padding_mask, deterministic
            )

        out = {"hidden": x}
        if compute_logits:
            h = nn.Dense(cfg.hidden_size, name="mlm_dense", dtype=self.dtype)(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=eps, name="mlm_norm")(h)
            logits = h.astype(jnp.float32) @ word.embedding.T.astype(jnp.float32)
            bias = self.param(
                "mlm_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32
            )
            out["logits"] = logits + bias
        return out
