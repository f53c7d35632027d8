"""Locate the Stage-3 train step's remaining overhead (VERDICT r1 task 3).

Three honest scan chains at the full config (B=32, L=1024, 16 layers),
all with the layer-block custom-VJP kernel:

  layers_only — 16 chained transformer_layer_block fwd+bwd (the Pallas
                kernel pair, no embedding/cond/head/masking/optimizer)
  model_grad  — value_and_grad of the OA-ARDM loss through the full model
                (adds embedding, cond MLPs, axial pos, final LN + head,
                masking, vocab loss)
  full_step   — model_grad + AdamW + EMA (the 114.7 ms/step number)

The deltas say where the gap to 120 TF/s lives before building anything.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_train_parts.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.ops.pallas.layer_block_tpu import transformer_layer_block
from biom3_tpu.training.stage3_task import make_stage3_train_step
from biom3_tpu.training.state import TrainState


def timed(label, jitted, args, iters, runs=2):
    t0 = time.perf_counter()
    np.asarray(jitted(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:12s}: {best / iters * 1e3:7.1f} ms/step  "
          f"(compile {comp:.0f}s)", flush=True)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--parts", nargs="*",
                    default=["layers_only", "model_grad", "full_step"])
    args = ap.parse_args()

    cfg = ProteoScribeConfig()
    B, L, d = args.batch, cfg.max_seq_len, cfg.dim
    rng = np.random.default_rng(0)
    model = ProteoScribe(cfg, dtype=jnp.bfloat16, attn_impl="layer-block")
    tokens = jnp.asarray(
        rng.integers(1, cfg.num_classes, (B, L)).astype(np.int32)
    )
    z_c = jnp.zeros((B, cfg.cond_dim), jnp.float32)
    params = model.init(
        jax.random.key(0), tokens[:1], jnp.zeros((1,), jnp.int32), z_c[:1]
    )
    print(f"device={jax.devices()[0]} B={B} L={L} iters={args.iters}",
          flush=True)

    if "layers_only" in args.parts:
        f32 = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.05
        )
        wargs = [f32(d, d) for _ in range(4)] + [f32(d)] + \
            [f32(d) for _ in range(4)] + \
            [f32(d, 4 * d), f32(4 * d), f32(4 * d, d), f32(d)]
        x0 = f32(B, L, d).astype(jnp.bfloat16)

        def loss16(x, *w):
            h = x
            for _ in range(cfg.depth):   # same weights each layer: timing only
                h = transformer_layer_block(
                    h, *w, local_heads=cfg.local_heads, heads=cfg.heads,
                    window=cfg.local_window,
                )
            return h.astype(jnp.float32).sum()

        grad16 = jax.value_and_grad(loss16, argnums=(0, 1))

        @jax.jit
        def chain16(x, w):
            def body(c, _):
                v, (gx, gw) = grad16(x + c.astype(x.dtype), *w)
                s = v + gx.astype(jnp.float32).sum() + gw.sum()
                return jnp.abs(s).astype(jnp.int32) % 2, s
            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=args.iters)
            return sums

        timed("layers_only", chain16, (x0, wargs), args.iters)

    if "model_grad" in args.parts:
        from biom3_tpu.training.stage3_task import stage3_loss_fn

        def loss_fn(p, key):
            return stage3_loss_fn(model.apply, p, key, tokens, z_c)[0]

        vg = jax.value_and_grad(loss_fn)

        @jax.jit
        def chain_grad(p, key):
            def body(c, k):
                v, g = vg(jax.tree.map(lambda a: a + c.astype(a.dtype), p), k)
                gs = sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(g))
                return (v + gs).astype(jnp.int32) % 2, v
            _, vs = jax.lax.scan(
                body, jnp.int32(0), jax.random.split(key, args.iters)
            )
            return vs

        timed("model_grad", chain_grad, (params, jax.random.key(1)),
              args.iters)

    if "full_step" in args.parts:
        tx = optax.adamw(1e-4)
        state = TrainState.create(params, tx, with_ema=True)
        step = make_stage3_train_step(model.apply, tx)

        @jax.jit
        def chain_step(state, key):
            def body(carry, k):
                st, _ = carry
                st, aux = step(st, {"tokens": tokens, "z_c": z_c}, k)
                return (st, aux["loss"]), ()
            (st, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0)),
                jax.random.split(key, args.iters),
            )
            return loss

        timed("full_step", chain_step, (state, jax.random.key(2)), args.iters)


if __name__ == "__main__":
    main()
