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
    def __call__(self, x: jax.Array, padding_mask: jax.Array | None) -> jax.Array:
        cfg = self.config
        B, L, E = x.shape
        H = cfg.num_heads
        Dh = E // H
        dense = lambda name: nn.Dense(E, name=name, dtype=self.dtype)
        q, k, v = dense("query")(x), dense("key")(x), dense("value")(x)
        split = lambda z: z.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        out = full_attention(split(q), split(k), split(v), padding_mask=padding_mask, impl=self.attn_impl)
        return out.transpose(0, 2, 1, 3).reshape(B, L, E)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: jax.Array | None) -> jax.Array:
        cfg = self.config
        eps = cfg.layer_norm_eps
        attn = BertSelfAttention(cfg, self.dtype, self.attn_impl, name="attention")(x, padding_mask)
        attn = nn.Dense(cfg.hidden_size, name="attention_output", dtype=self.dtype)(attn)
        x = nn.LayerNorm(epsilon=eps, name="attention_norm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, name="intermediate", dtype=self.dtype)(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output", dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=eps, name="output_norm")(x + h)


class BertEncoder(nn.Module):
    """forward(input_ids (B, L)) → {"hidden": (B, L, E) last layer,
    "logits": (B, L, V) MLM logits when compute_logits}."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        *,
        attention_mask: jax.Array | None = None,
        compute_logits: bool = False,
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

        # reference passes no attention mask (model.py:124,129): attends PADs.
        padding_mask = None
        if attention_mask is not None:
            padding_mask = attention_mask == 0

        for i in range(cfg.num_layers):
            x = BertLayer(cfg, self.dtype, self.attn_impl, name=f"layer_{i}")(x, padding_mask)

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
