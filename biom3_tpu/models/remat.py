"""Layer rematerialization policies for the tower models.

``remat`` on ESM2/BERT/PenCL accepts:

  * False   — store all activations (serving / small models)
  * True    — full per-layer remat (recompute everything in the backward;
              the memory floor: fits 650M-tower training on one 16 GB chip)
  * "dots"  — ``jax.checkpoint_policies.dots_with_no_batch_dims_saveable``:
              keep matmul outputs, recompute only elementwise/LN work.
              Measured on-chip (tools/bench_train_stage1.py, full-size
              PenCL B=4): 356 → 338 ms/step vs full remat (~5% — the
              backward is GEMM-bound, so skipping elementwise recompute
              buys little; use when activation memory allows).
"""

from __future__ import annotations

import jax
import flax.linen as nn


def remat_layer(layer_cls, remat: bool | str, static_argnums=()):
    if not remat:
        return layer_cls
    if remat is True:
        return nn.remat(layer_cls, static_argnums=static_argnums)
    if remat == "dots":
        return nn.remat(
            layer_cls,
            static_argnums=static_argnums,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(f"unknown remat mode {remat!r}; use False/True/'dots'")
