"""Optimizers + LR schedules matching the reference's training runtime.

Reference optimizer zoo (``Stage3_source/PL_wrapper.py:84-102``): AdamW,
Adafactor, Adam, DeepSpeedCPUAdam.  On TPU, ``DeepSpeedCPUAdam`` (a CPU
AVX offload op) maps to plain optax AdamW with FSDP-sharded states in HBM —
at ≤650M params offload buys nothing on a v5e (SURVEY.md §2.4).

Schedules: ``coswarmup`` per-step cosine-with-warmup (``:104-133``; warmup =
one epoch's steps) and per-epoch exponential decay (``:142-150``).  Stage-1
uses per-module LR groups (``Stage1_source/PL_wrapper.py:1309-1326``),
covered by ``make_grouped_optimizer``.
"""

from __future__ import annotations

import math
from typing import Callable, Mapping

import optax


def coswarmup_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, num_cycles: float = 0.5
) -> Callable:
    """Linear warmup then cosine decay; exact reference lambda
    (Stage3_source/PL_wrapper.py:113-126)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / max(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def exponential_epoch_schedule(
    base_lr: float, gamma: float, steps_per_epoch: int
) -> Callable:
    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // steps_per_epoch
        return base_lr * gamma ** epoch.astype(jnp.float32)

    return schedule


def make_optimizer(
    name: str = "AdamW",
    lr: float | Callable = 1e-4,
    weight_decay: float = 0.0,
    *,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    """Build the reference's optimizer choices on optax."""
    name_l = name.lower()
    if name_l in ("adamw", "deepspeedcpuadam"):
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name_l == "adam":
        tx = optax.adam(lr)
    elif name_l == "adafactor":
        tx = optax.adafactor(lr, weight_decay_rate=weight_decay or None)
    else:
        raise ValueError(
            f"unknown optimizer {name!r}; choose AdamW/Adam/AdaFactor/DeepSpeedCPUAdam"
        )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_grouped_optimizer(
    group_fn: Callable[[tuple], str],
    group_lrs: Mapping[str, float | Callable],
    weight_decay: float = 0.0,
    decay_groups: tuple = (),
    optimizer: str = "adamw",
    moment_dtype=None,
) -> optax.GradientTransformation:
    """Per-parameter-group optimizer (Stage-1's per-tower LRs).

    group_fn maps a param path tuple → group label; each label gets its own
    transform.  ``decay_groups`` lists the labels that receive weight decay
    (the reference decays only the projection heads via the group's own
    ``weight_decay`` entry plus a global decay — we apply decay per group).

    Optimizer-state compression (the TPU-native answer to the reference's
    DeepSpeedCPUAdam offload, ``Stage3_source/PL_wrapper.py:101-102``; the
    762M-param f32 Adam states are what cap the Stage-1 single-chip batch
    at 16 — BACKLOG r4 "Stage-1 knee"):

      * ``optimizer="adafactor"`` — factored second moments, no first
        moment: ~8.9 GB of state becomes ~param-sized+ε.
      * ``moment_dtype=jnp.bfloat16`` (adamw only) — half-precision first
        moment (optax ``mu_dtype``), ~1.5 GB back at 762M params with
        Adam semantics otherwise unchanged.
    """
    import jax

    optimizer = optimizer.lower()
    if optimizer in ("adamw", "deepspeedcpuadam"):
        def make_tx(lr, wd):
            return optax.adamw(lr, weight_decay=wd, mu_dtype=moment_dtype)
    elif optimizer == "adafactor":
        if moment_dtype is not None:
            raise ValueError("moment_dtype applies to adamw only "
                             "(adafactor keeps no first moment)")
        def make_tx(lr, wd):
            return optax.adafactor(lr, weight_decay_rate=wd or None)
    else:
        raise ValueError(f"unknown grouped optimizer {optimizer!r}; "
                         "choose adamw/adafactor")

    transforms = {
        label: make_tx(
            lr, weight_decay if label in decay_groups else 0.0
        )
        for label, lr in group_lrs.items()
    }

    def labeler(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: group_fn(path), params
        )

    return optax.multi_transform(transforms, labeler)
