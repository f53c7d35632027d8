"""Stage-1 PenCL: dual-tower contrastive model (protein + text → joint 512-d).

Re-implementation of ``pfam_PEN_CL`` (``Stage1_source/model.py:178-465``):
ESM2-650M protein tower (CLS of repr layer 33), PubMedBERT text tower (CLS of
last hidden state), and two residual projection heads into the shared 512-d
space.  Loss functions are pure jnp ports of the reference's inter/intra
contrastive InfoNCE and the masked-positions MLM loss (the reference's
per-sample Python loop at ``model.py:448-457`` becomes one masked mean).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from biom3_tpu.config import PenCLConfig
from biom3_tpu.models.bert import BertEncoder
from biom3_tpu.models.esm2 import ESM2


class ProjectionHead(nn.Module):
    """Linear → GELU → Linear → Dropout → +residual → LayerNorm
    (ref Stage1_source/model.py:136-167)."""

    proj_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        projected = nn.Dense(self.proj_dim, name="projection", dtype=self.dtype)(z)
        h = jax.nn.gelu(projected, approximate=False)
        h = nn.Dense(self.proj_dim, name="fc", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h + projected
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h)


class PenCL(nn.Module):
    """forward(x_t (B, Lt), x_p (B, Lp)) → {"text_joint_latent", "seq_joint_latent"}
    or MLM logits when ``compute_masked_logits`` (ref model.py:209-239)."""

    config: PenCLConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool | str = False  # tower-layer remat: False / True (full) /
                         # "dots" (keep matmul outputs — models.remat);
                         # full-size contrastive training fits a 16 GB chip
    gelu: str = "erf"    # ESM2 FF activation; "tanh" = serving perf mode
                         # (drift recorded — parity/training keep "erf")

    def setup(self):
        cfg = self.config
        self.protein_encoder = ESM2(
            cfg.esm, self.dtype, self.attn_impl, remat=self.remat,
            gelu=self.gelu,
        )
        # "layer-block" is the ESM2 training kernel (esm2_block_tpu); the
        # BERT tower has no such impl — it keeps the XLA graph (its share
        # of the pair step is small; see tools/exp_tower_attn.py decomp)
        bert_impl = ("xla" if self.attn_impl.startswith("layer-block")
                     else self.attn_impl)
        self.text_encoder = BertEncoder(
            cfg.bert, self.dtype, bert_impl, remat=self.remat
        )
        self.protein_projection = ProjectionHead(cfg.proj_dim, cfg.dropout, self.dtype)
        self.text_projection = ProjectionHead(cfg.proj_dim, cfg.dropout, self.dtype)

    def __call__(
        self,
        x_t: jax.Array,
        x_p: jax.Array,
        *,
        compute_masked_logits: bool = False,
        deterministic: bool = True,
    ) -> dict:
        if compute_masked_logits:
            p = self.protein_encoder(x_p, compute_logits=True)
            t = self.text_encoder(
                x_t, compute_logits=True, deterministic=deterministic
            )
            return {
                "text_masked_logits": t["logits"],
                "protein_masked_logits": p["logits"],
            }
        z_t = self.text_encoder(x_t, deterministic=deterministic)["hidden"][:, 0, :]
        z_p = self.protein_encoder(x_p)["hidden"][:, 0, :]
        return {
            "text_joint_latent": self.text_projection(
                z_t, deterministic=deterministic
            ),
            "seq_joint_latent": self.protein_projection(
                z_p, deterministic=deterministic
            ),
        }

    def encode_text(self, x_t: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """Text-only path: caption tokens → projected z_t (used by the e2e
        pipeline, which never needs the protein tower at inference)."""
        z_t = self.text_encoder(x_t, deterministic=deterministic)["hidden"][:, 0, :]
        return self.text_projection(z_t, deterministic=deterministic)

    def encode_protein(self, x_p: jax.Array, *, deterministic: bool = True) -> jax.Array:
        z_p = self.protein_encoder(x_p)["hidden"][:, 0, :]
        return self.protein_projection(z_p, deterministic=deterministic)

    def init_all_params(self, x_t: jax.Array, x_p: jax.Array) -> dict:
        """Init method touching both the latent and MLM branches so the full
        parameter tree (incl. LM heads) is created:
        ``model.init(key, x_t, x_p, method=PenCL.init_all_params)``."""
        self(x_t, x_p, compute_masked_logits=True)
        return self(x_t, x_p)


# --- losses (pure functions; ref Stage1_source/model.py:241-465) -----------

NEG_FILL_F32 = -9e15  # ref set_inf for fp32 (model.py:365-381)
NEG_FILL_F16 = -1e4


def _set_inf(x: jax.Array, mask: jax.Array) -> jax.Array:
    fill = NEG_FILL_F32 if x.dtype == jnp.float32 else NEG_FILL_F16
    return jnp.where(mask, fill, x)


def _soft_cross_entropy(preds: jax.Array, targets: jax.Array) -> jax.Array:
    """(-targets · log_softmax(preds)).sum(-1) (ref cross_entropy :383-399)."""
    return jnp.sum(-targets * jax.nn.log_softmax(preds, axis=-1), axis=-1)


def compute_inter_loss(
    protein_embeddings: jax.Array,
    text_embeddings: jax.Array,
    batch_size: int,
    temperature: float,
):
    """Inter-modal InfoNCE over the 2B (SwissProt+Pfam) global batch
    (ref compute_inter_loss :241-307).  Returns (loss, masked logits)."""
    n = protein_embeddings.shape[0]
    eye = jnp.eye(batch_size, dtype=bool)
    mask = jnp.zeros((n, n), dtype=bool)
    mask = mask.at[batch_size:, :batch_size].set(eye)
    mask = mask.at[:batch_size, batch_size:].set(eye)

    logits = (text_embeddings @ protein_embeddings.T) / temperature
    protein_sim = protein_embeddings @ protein_embeddings.T
    text_sim = text_embeddings @ text_embeddings.T

    m_protein = _set_inf(protein_sim, mask)
    m_text = _set_inf(text_sim, mask)
    m_logits = _set_inf(logits, mask)

    targets = jax.nn.softmax((m_protein + m_text) / (2 * temperature), axis=-1)
    text_loss = _soft_cross_entropy(m_logits, targets)
    protein_loss = _soft_cross_entropy(m_logits.T, targets.T)
    loss = jnp.mean((protein_loss + text_loss) / 2.0)
    return loss, m_logits


def compute_intra_loss(protein_embeddings: jax.Array, temperature: float):
    """Intra-modal InfoNCE; positives sit half the global batch away
    (ref compute_intra_loss :310-363).  Returns (loss, similarity)."""
    n = protein_embeddings.shape[0]
    sim = (protein_embeddings @ protein_embeddings.T) / temperature
    eye = jnp.eye(n, dtype=bool)
    sim = _set_inf(sim, eye)
    # positives: roll(eye, n//2, axis=0) puts row r's positive at column
    # (r - n//2) mod n; gather instead of boolean indexing (jit-safe)
    pos_cols = (jnp.arange(n) - n // 2) % n
    positives = jnp.take_along_axis(sim, pos_cols[:, None], axis=1)[:, 0]
    nll = -positives + jax.nn.logsumexp(sim, axis=-1)
    return jnp.mean(nll), sim


def compute_masked_lang_loss(
    logits_masked: jax.Array,
    targets: jax.Array,
    targets_masked: jax.Array,
    mask_token_id: int,
):
    """Mean CE over masked positions, averaged per-sample then over samples
    with ≥1 mask (ref compute_masked_lang_loss :401-465, vectorized)."""
    logp = jax.nn.log_softmax(logits_masked.astype(jnp.float32), axis=-1)
    tgt = targets.reshape(targets.shape[0], -1).astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (B, L)
    is_masked = targets_masked.reshape(tgt.shape) == mask_token_id
    per_sample = jnp.sum(ce * is_masked, axis=-1) / jnp.maximum(
        1, jnp.sum(is_masked, axis=-1)
    )
    has_mask = jnp.any(is_masked, axis=-1)
    return jnp.sum(per_sample * has_mask) / jnp.maximum(1, jnp.sum(has_mask))
