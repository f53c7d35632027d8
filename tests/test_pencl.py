"""PenCL model + contrastive/MLM loss parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import BertConfig, ESM2Config, PenCLConfig
from biom3_tpu.models.pencl import (
    PenCL,
    compute_inter_loss,
    compute_intra_loss,
    compute_masked_lang_loss,
)

SMALL = PenCLConfig(
    esm=ESM2Config(num_layers=2, embed_dim=32, attention_heads=2, vocab_size=33),
    bert=BertConfig(
        num_layers=2, hidden_size=48, num_heads=2, intermediate_size=64,
        vocab_size=50, max_position_embeddings=32,
    ),
    protein_embedding=32,
    text_embedding=48,
    proj_dim=16,
    temperature=0.8,
)


@pytest.mark.slow  # 14 s; the same forward (incl. masked-logit heads) is
# compiled default inside test_stage12_training::test_stage1_train_step
def test_pencl_forward_shapes():
    model = PenCL(SMALL)
    x_t = jnp.zeros((3, 10), jnp.int32)
    x_p = jnp.zeros((3, 12), jnp.int32)
    params = model.init(jax.random.key(0), x_t, x_p, method=PenCL.init_all_params)
    out = model.apply(params, x_t, x_p)
    assert out["text_joint_latent"].shape == (3, 16)
    assert out["seq_joint_latent"].shape == (3, 16)
    logits = model.apply(params, x_t, x_p, compute_masked_logits=True)
    assert logits["text_masked_logits"].shape == (3, 10, 50)
    assert logits["protein_masked_logits"].shape == (3, 12, 33)


def _torch_inter_loss(protein, text, batch_size, temperature):
    """Transcription of Stage1_source/model.py:241-307."""
    import torch
    import torch.nn.functional as F

    protein = torch.from_numpy(protein)
    text = torch.from_numpy(text)
    n = protein.shape[0]
    mask = torch.zeros((n, n))
    mask[batch_size:, :batch_size] = torch.eye(batch_size)
    mask[:batch_size, batch_size:] = torch.eye(batch_size)
    mask = mask.bool()

    logits = (text @ protein.T) / temperature
    psim = protein @ protein.T
    tsim = text @ text.T
    fill = -9e15
    psim = psim.masked_fill(mask, fill)
    tsim = tsim.masked_fill(mask, fill)
    mlogits = logits.masked_fill(mask, fill)
    targets = F.softmax((psim + tsim) / (2 * temperature), dim=-1)
    tl = (-targets * F.log_softmax(mlogits, dim=-1)).sum(1)
    pl = (-targets.T * F.log_softmax(mlogits.T, dim=-1)).sum(1)
    return ((pl + tl) / 2.0).mean().item()


def test_inter_loss_matches_reference(rng):
    B = 6  # global batch = 2×3 (swiss + pfam)
    protein = rng.standard_normal((B, 16)).astype(np.float32)
    text = rng.standard_normal((B, 16)).astype(np.float32)
    ref = _torch_inter_loss(protein, text, B // 2, 0.8)
    loss, logits = compute_inter_loss(
        jnp.asarray(protein), jnp.asarray(text), B // 2, 0.8
    )
    assert float(loss) == pytest.approx(ref, rel=1e-5)
    assert logits.shape == (B, B)


def _torch_intra_loss(protein, temperature):
    """Transcription of Stage1_source/model.py:310-363."""
    import torch

    p = torch.from_numpy(protein)
    sim = (p @ p.T) / temperature
    n = p.shape[0]
    mask = torch.eye(n, dtype=torch.bool)
    sim = sim.masked_fill(mask, -9e15)
    pos = mask.roll(shifts=n // 2, dims=0)
    nll = -sim[pos] + torch.logsumexp(sim, dim=-1)
    return nll.mean().item()


def test_intra_loss_matches_reference(rng):
    protein = rng.standard_normal((8, 16)).astype(np.float32)
    ref = _torch_intra_loss(protein, 0.8)
    loss, sim = compute_intra_loss(jnp.asarray(protein), 0.8)
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def _torch_masked_lang_loss(logits, targets, targets_masked, mask_id):
    """Transcription of Stage1_source/model.py:401-465 (per-sample loop)."""
    import torch
    import torch.nn as nn

    logits = torch.from_numpy(logits)
    targets = torch.from_numpy(targets.astype(np.int64))
    targets_masked = torch.from_numpy(targets_masked.astype(np.int64))
    loss_fn = nn.CrossEntropyLoss(reduction="none")
    loss_mask = loss_fn(logits.permute(0, 2, 1), targets)
    batch_loss = []
    for ii, tm in enumerate(targets_masked):
        positions = (tm == mask_id).tolist()
        sample = loss_mask[ii][positions]
        if sample.numel() > 0:
            batch_loss.append(sample.mean().unsqueeze(0))
    return torch.cat(batch_loss).mean().item()


def test_masked_lang_loss_matches_reference(rng):
    B, L, V = 3, 10, 20
    mask_id = 7
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    targets = rng.integers(0, V, (B, L)).astype(np.int32)
    masked = targets.copy()
    masked[0, [1, 4]] = mask_id
    masked[1, [0]] = mask_id
    masked[2, [2, 3, 9]] = mask_id
    ref = _torch_masked_lang_loss(logits, targets, masked, mask_id)
    loss = compute_masked_lang_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(masked), mask_id
    )
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_masked_lang_loss_sample_without_masks(rng):
    """Rows with zero masked positions are excluded from the mean (the
    reference appends nothing for them)."""
    B, L, V = 2, 6, 10
    mask_id = 3
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    targets = rng.integers(0, V, (B, L)).astype(np.int32)
    masked = targets.copy()
    masked[0, [1, 2]] = mask_id  # row 1 has no masks
    ref = _torch_masked_lang_loss(logits, targets, masked, mask_id)
    loss = compute_masked_lang_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(masked), mask_id
    )
    assert float(loss) == pytest.approx(ref, rel=1e-5)
