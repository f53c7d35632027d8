"""Stage-1 (PenCL) training task: global-batch contrastive + MLM step.

Replaces ``pfam_PL_PEN_CL.training_step`` (``Stage1_source/PL_wrapper.py:
931-1114``).  The reference's distributed recipe is four explicit
``all_gather(sync_grads=True)`` calls fenced by ``dist.barrier()`` so every
rank computes the contrastive loss over the global batch.  Under SPMD the
same program is written once over the *global* batch with the batch axis
sharded over (dp, fsdp): XLA inserts the (differentiable) all-gathers where
the (2B, 2B) similarity matrices need them, and barriers are implicit.

Loss = inter-modal InfoNCE + intra-modal InfoNCE (dropped for
``dataset_type='pfam_ablated'``) + text MLM + protein MLM
(ref :1078-1089).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from biom3_tpu.models.pencl import (
    compute_inter_loss,
    compute_intra_loss,
    compute_masked_lang_loss,
)
from biom3_tpu.training.metrics import contrastive_metrics
from biom3_tpu.training.state import TrainState


def stage1_loss_fn(
    apply_fn: Callable,
    params,
    batch: dict,
    *,
    temperature: float,
    dataset_type: str = "pfam",
    text_mask_id: int,
    protein_mask_id: int,
    dropout_key: jax.Array | None = None,
):
    """batch keys: {text,protein}_tokens[,_masked] and pfam_* equivalents.

    ``dataset_type`` selects the loss composition, covering the reference's
    three Lightning wrappers (Stage1_source/PL_wrapper.py):
      * "default"      — inter-modal loss only (PL_PEN_CL:32; SwissProt pairs
        duplicated into both batch halves when no pfam batch is given),
      * "masked"       — inter + text/protein MLM (mask_PL_PEN_CL:411),
      * "pfam"         — dual SwissProt+Pfam batch, inter+intra+2×MLM
        (pfam_PL_PEN_CL:861),
      * "pfam_ablated" — pfam minus the intra loss (:1078-1089).

    ``dropout_key`` activates train-mode dropout (projection heads' 0.1,
    stage1_config.json:46, plus the BERT tower's internal dropout — the
    reference trains through Lightning train mode so both fire there);
    ``None`` keeps every forward deterministic (eval semantics).
    """
    has_pfam = "pfam_text_tokens" in batch

    def fwd(key, *args, **kwargs):
        if dropout_key is None:
            return apply_fn(params, *args, **kwargs)
        return apply_fn(
            params, *args, **kwargs,
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(dropout_key, key)},
        )

    out_swiss = fwd(0, batch["text_tokens"], batch["protein_tokens"])
    if has_pfam:
        out_pfam = fwd(
            1, batch["pfam_text_tokens"], batch["pfam_protein_tokens"]
        )
        z_t_all = jnp.concatenate(
            [out_swiss["text_joint_latent"], out_pfam["text_joint_latent"]]
        )
        z_p_all = jnp.concatenate(
            [out_swiss["seq_joint_latent"], out_pfam["seq_joint_latent"]]
        )
    else:
        z_t_all = out_swiss["text_joint_latent"]
        z_p_all = out_swiss["seq_joint_latent"]
    half = z_p_all.shape[0] // 2

    loss_align, logits = compute_inter_loss(z_p_all, z_t_all, half, temperature)
    aux = {"loss_align": loss_align, "logits": logits}
    loss = loss_align

    if dataset_type in ("pfam",):
        loss_intra, _ = compute_intra_loss(z_p_all, temperature)
        aux["loss_intra"] = loss_intra
        loss = loss + loss_intra
    elif dataset_type == "pfam_ablated":
        loss_intra, _ = compute_intra_loss(z_p_all, temperature)
        aux["loss_intra"] = loss_intra  # tracked, excluded from total

    if dataset_type in ("masked", "pfam", "pfam_ablated"):
        def cat(key):
            if has_pfam:
                return jnp.concatenate([batch[key], batch["pfam_" + key]])
            return batch[key]

        all_text, all_protein = cat("text_tokens"), cat("protein_tokens")
        all_text_masked = cat("text_tokens_masked")
        all_protein_masked = cat("protein_tokens_masked")
        mlm = fwd(2, all_text_masked, all_protein_masked, compute_masked_logits=True)
        loss_text_mask = compute_masked_lang_loss(
            mlm["text_masked_logits"], all_text, all_text_masked, text_mask_id
        )
        loss_seq_mask = compute_masked_lang_loss(
            mlm["protein_masked_logits"], all_protein, all_protein_masked,
            protein_mask_id,
        )
        aux["loss_text_mask"] = loss_text_mask
        aux["loss_seq_mask"] = loss_seq_mask
        loss = loss + loss_text_mask + loss_seq_mask
    elif dataset_type != "default":
        raise ValueError(f"Unexpected dataset_type {dataset_type!r}")

    aux["loss"] = loss
    return loss, aux


def make_stage1_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    temperature: float,
    dataset_type: str = "pfam",
    text_mask_id: int,
    protein_mask_id: int,
    with_metrics: bool = True,
):
    loss_fn = functools.partial(
        stage1_loss_fn,
        apply_fn,
        temperature=temperature,
        dataset_type=dataset_type,
        text_mask_id=text_mask_id,
        protein_mask_id=protein_mask_id,
    )

    def train_step(state: TrainState, batch: dict, key: jax.Array | None = None):
        """``key`` activates train-mode dropout (reference recipe); ``None``
        runs the deterministic forward (also the reproducible-CI path)."""
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, dropout_key=key
        )
        new_state = state.apply_gradients(grads, tx)
        logits = aux.pop("logits")
        if with_metrics:
            aux.update(contrastive_metrics(logits))
        return new_state, aux

    return train_step


def make_stage1_optimizer(cfg) -> optax.GradientTransformation:
    """Per-group optimizer: protein tower / text tower / projection heads
    each at their own LR (ref configure_optimizers, PL_wrapper.py:1309-1326).

    Beyond the reference's AdamW: ``"optimizer": "adafactor"`` (factored
    second moments) and ``"moment_dtype": "bfloat16"`` (bf16 Adam first
    moment) compress the f32 optimizer states that cap the single-chip
    batch at 16 (BACKLOG r4 "Stage-1 knee"; the reference's answer to the
    same wall is DeepSpeedCPUAdam CPU offload)."""
    import jax.numpy as jnp

    from biom3_tpu.training.optim import make_grouped_optimizer

    def group_of(path) -> str:
        # path starts at the variables root ("params", ...); find the tower
        keys = {str(getattr(k, "key", k)) for k in path}
        if "protein_encoder" in keys:
            return "protein"
        if "text_encoder" in keys:
            return "text"
        return "heads"

    moment_dtype = cfg.get("moment_dtype", None)
    if moment_dtype in (None, "None", "float32"):
        moment_dtype = None
    elif moment_dtype == "bfloat16":
        moment_dtype = jnp.bfloat16
    else:
        raise ValueError(f"moment_dtype must be float32/bfloat16, "
                         f"got {moment_dtype!r}")
    return make_grouped_optimizer(
        group_of,
        {
            "protein": cfg.float("protein_encoder_lr", 5e-4),
            "text": cfg.float("text_encoder_lr", 5e-4),
            "heads": cfg.float("head_lr", 5e-4),
        },
        weight_decay=cfg.float("weight_decay", 0.0),
        decay_groups=("protein", "text", "heads"),
        optimizer=cfg.get("optimizer", "adamw"),
        moment_dtype=moment_dtype,
    )
