"""Stage-3 (ProteoScribe) training task: sharded OA-ARDM train step.

Replaces the reference's ``PL_ProtARDM`` Lightning module
(``Stage3_source/PL_wrapper.py:40-333``): one jitted SPMD step computing the
conditional ELBO over a (dp, fsdp)-sharded batch with fsdp/tp-sharded params
and optimizer state, optional microbatch gradient accumulation via
``lax.scan`` (the reference's ``acc_grad_batches``), and a fused functional
EMA (the reference's wired-but-disabled DSEma path, here first-class).

Heavy eval metrics run on a cadence (``enter_eval``), not every step —
fixing the reference's per-step host-side metric drag (SURVEY.md Q7).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from biom3_tpu.diffusion.oa_ardm import (
    mask_realizations,
    oa_ardm_loss,
    sample_random_paths,
    sample_timesteps,
)
from biom3_tpu.training.state import TrainState


def stage3_loss_fn(apply_fn: Callable, params, key, tokens, z_c):
    """Loss + aux for one microbatch. tokens: (B, L) shifted train ids.

    The forward runs in train mode (``deterministic=False`` + dropout rng):
    the model's dropout knobs (``attn_layer_dropout``/``ff_dropout``,
    ProteoScribeConfig) fire when nonzero and are exact no-ops at the
    published config (input_dp_rate=0.0, stage3_config.json:54)."""
    B, L = tokens.shape
    k_path, k_t, k_drop = jax.random.split(key, 3)
    path = sample_random_paths(k_path, B, L)
    t = sample_timesteps(k_t, B, L)
    masked = mask_realizations(tokens, path, t)
    logits = apply_fn(
        params, masked, t, z_c,
        deterministic=False, rngs={"dropout": k_drop},
    )
    loss = oa_ardm_loss(logits, tokens, masked, t)

    # cheap on-device diagnostics (full metric suite lives in training.metrics)
    pred = jnp.argmax(logits, axis=-1)
    unsampled = masked == 0
    acc_unsampled = jnp.sum((pred == tokens) & unsampled) / jnp.maximum(
        1, jnp.sum(unsampled)
    )
    return loss, {"loss": loss, "acc_unsampled": acc_unsampled}


def make_stage3_eval_step(apply_fn: Callable):
    """Validation step with the full metric suite (the reference's
    validation_step + performance_step, PL_wrapper.py:217-333), on device:
    ELBO loss plus time-split hard accuracy / entropy-ppl / positional
    entropy of a sampled reconstruction."""
    from biom3_tpu.training.metrics import positional_entropy, time_split_metrics

    def eval_step(params, batch: dict, key: jax.Array):
        tokens, z_c = batch["tokens"], batch["z_c"]
        B, L = tokens.shape
        k_path, k_t, k_samp = jax.random.split(key, 3)
        path = sample_random_paths(k_path, B, L)
        t = sample_timesteps(k_t, B, L)
        masked = mask_realizations(tokens, path, t)
        logits = apply_fn(params, masked, t, z_c)
        loss = oa_ardm_loss(logits, tokens, masked, t)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        sample_seq = jax.random.categorical(k_samp, logits.astype(jnp.float32), axis=-1)
        metrics = {"loss": loss, "pos_entropy": positional_entropy(probs)}
        metrics.update(
            time_split_metrics(sample_seq, tokens, probs, path, t)
        )
        return metrics

    return eval_step


def make_stage3_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    ema_beta: float = 0.9999,
):
    """Build the (jittable) train step.

    batch: dict with "tokens" (B, L) int32 (shifted train ids) and
    "z_c" (B, cond_dim) f32.  With accum_steps > 1 the leading batch dim is
    split into microbatches scanned sequentially (grad accumulation).
    """

    def grads_for(params, key, tokens, z_c):
        (loss, aux), grads = jax.value_and_grad(
            functools.partial(stage3_loss_fn, apply_fn), has_aux=True
        )(params, key, tokens, z_c)
        return grads, aux

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        tokens, z_c = batch["tokens"], batch["z_c"]
        if accum_steps == 1:
            grads, aux = grads_for(state.params, key, tokens, z_c)
        else:
            B = tokens.shape[0]
            mb = B // accum_steps
            tok_mb = tokens[: mb * accum_steps].reshape(accum_steps, mb, -1)
            zc_mb = z_c[: mb * accum_steps].reshape(accum_steps, mb, -1)
            keys = jax.random.split(key, accum_steps)

            def body(carry, xs):
                k, tok, zc = xs
                g, aux = grads_for(state.params, k, tok, zc)
                return jax.tree.map(jnp.add, carry, g), aux

            zero = jax.tree.map(jnp.zeros_like, state.params)
            gsum, auxes = jax.lax.scan(body, zero, (keys, tok_mb, zc_mb))
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            aux = jax.tree.map(lambda a: a.mean(), auxes)
        new_state = state.apply_gradients(grads, tx, ema_beta=ema_beta)
        return new_state, aux

    return train_step


def make_sharded_stage3_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh,
    params,
    *,
    with_ema: bool = True,
    accum_steps: int = 1,
    ema_beta: float = 0.9999,
):
    """Build a mesh-sharded train step + state.

    Delegates to ``training.sharded.make_sharded_train_step`` (params by
    the fsdp/tp partition rules, optimizer state sharded by GSPMD
    propagation, batch leading dim over (dp, fsdp)).

    Returns (jitted_step, sharded_state).
    """
    from biom3_tpu.training.sharded import make_sharded_train_step

    step = make_stage3_train_step(
        apply_fn, tx, accum_steps=accum_steps, ema_beta=ema_beta
    )
    return make_sharded_train_step(
        step, tx, mesh, params, with_ema=with_ema, has_rng=True
    )
