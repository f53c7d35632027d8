"""Stage-3 training CLI: OA-ARDM training of ProteoScribe on TPU.

The reference ships no training entry point (its Lightning Trainer launch
lived outside the repo; SURVEY.md §3.5); this CLI provides one, driven by the
same ``stage3_config.json``: data from Stage-2 embedding dicts
(``swissprot_data_root``/``pfam_data_root``), optimizer/schedule/accumulation
from the config keys (``choose_optim``, ``scheduler_gamma``,
``acc_grad_batches``), EMA, orbax checkpointing, metric cadence via
``enter_eval`` (fixing the reference's every-step metric drag, Q7), and
dp/fsdp/tp sharding over all available devices.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import ProteoScribeConfig, load_json_config
from biom3_tpu.data.loader import BatchLoader
from biom3_tpu.data.stage3_data import (
    Stage3Dataset,
    merge_data_dicts,
    prepare_protein_data,
)
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.optim import (
    coswarmup_schedule,
    exponential_epoch_schedule,
    make_optimizer,
)
from biom3_tpu.training.stage3_task import (
    make_stage3_eval_step,
    make_stage3_train_step,
)
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.logging import MetricLogger


def parse_arguments():
    p = argparse.ArgumentParser(description="BioM3 Stage-3 training")
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--swissprot_data_root", type=str, default=None)
    p.add_argument("--pfam_data_root", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop after N optimizer steps (default: epochs×data)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export_bin", type=str, default=None,
                   help="after training, also write the params as a "
                        "published-layout .bin ('transformer.*' keys) — "
                        "directly servable via run_proteoscribe_sample")
    p.add_argument("--export_params", choices=["ema", "final"],
                   default="ema",
                   help="which weights go into --export_bin (the reference "
                        "serves the ZeRO-EMA weights, DSEma.py)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--layer-mode",
                   choices=["layer_block", "block", "unrolled",
                            "unrolled_remat", "scan_remat"],
                   default="unrolled",
                   help="layer graph construction; measured on-chip "
                        "(tools/bench_train.py, B=32): layer_block "
                        "114.7 ms/step (whole-layer custom-VJP Pallas "
                        "kernel, fastest; zero-dropout configs only — the "
                        "published stage3 config — and ~8 min compiles), "
                        "block 158 ms (fused attention-block custom VJP), "
                        "unrolled 253 ms (pure-XLA default), "
                        "unrolled_remat 323 ms (low-memory), "
                        "scan_remat 325 ms (low-memory + ~3x faster "
                        "compiles).  Plain scan-without-remat is rejected "
                        "by the TPU compiler on the backward graph.")
    return p.parse_args()


def load_training_data(cfg, args):
    from biom3_tpu.io.torch_load import load_torch_file

    sp = args.swissprot_data_root or cfg.str_or_none("swissprot_data_root")
    pf = args.pfam_data_root or cfg.str_or_none("pfam_data_root")
    dicts = [load_torch_file(p) for p in (sp, pf) if p]
    if not dicts:
        raise SystemExit("no training data: set --swissprot_data_root/--pfam_data_root")
    data = dicts[0] if len(dicts) == 1 else merge_data_dicts(*dicts)
    tokens, emb = prepare_protein_data(cfg, data)
    return Stage3Dataset(
        tokens, emb,
        valid_size=cfg.float("valid_size", 0.1), seed=cfg.int("seed", 42),
    )


def main() -> None:
    args = parse_arguments()
    cfg = load_json_config(args.json_path)
    model_cfg = ProteoScribeConfig.from_stage_config(cfg)

    dataset = load_training_data(cfg, args)
    tok_train, emb_train = dataset.split("train")
    tok_val, emb_val = dataset.split("val")
    print(f"train examples: {len(tok_train)}, val: {len(tok_val)}")

    batch_size = cfg.int("batch_size", 16)
    epochs = cfg.int("epochs", 1)
    steps_per_epoch = max(1, len(tok_train) // batch_size)
    total_steps = args.max_steps or steps_per_epoch * epochs

    sched_cfg = cfg.get("scheduler_gamma")
    lr = cfg.float("learning_rate", 1e-4)
    if isinstance(sched_cfg, str) and sched_cfg.lower() == "coswarmup":
        lr = coswarmup_schedule(lr, steps_per_epoch, steps_per_epoch * epochs)
    elif sched_cfg is not None and not isinstance(sched_cfg, str):
        lr = exponential_epoch_schedule(lr, float(sched_cfg), steps_per_epoch)
    tx = make_optimizer(
        cfg.get("choose_optim", "AdamW"), lr,
        weight_decay=cfg.float("weight_decay", 0.0),
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    layer_kw = {
        "layer_block": {"attn_impl": "layer-block"},
        "block": {"attn_impl": "block"},
        "unrolled": {},
        "unrolled_remat": {"remat": True},
        "scan_remat": {"scan_layers": True, "scan_unroll": 2, "remat": True},
    }[args.layer_mode]
    if args.layer_mode == "layer_block" and (
        model_cfg.attn_layer_dropout > 0 or model_cfg.ff_dropout > 0
    ):
        raise SystemExit(
            "--layer-mode layer_block has no dropout path "
            f"(attn_layer_dropout={model_cfg.attn_layer_dropout}, "
            f"ff_dropout={model_cfg.ff_dropout}); use 'block' or 'unrolled'"
        )
    model = ProteoScribe(model_cfg, dtype=dtype, **layer_kw)
    params = model.init(
        jax.random.key(cfg.int("seed", 42)),
        jnp.zeros((1, model_cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, model_cfg.cond_dim)),
    )
    state = TrainState.create(params, tx, with_ema=True)
    step_fn = jax.jit(make_stage3_train_step(
        model.apply, tx, accum_steps=cfg.int("acc_grad_batches", 1)
    ), donate_argnums=(0,))  # alias in/out state — halves state HBM
    eval_fn = jax.jit(make_stage3_eval_step(model.apply))

    from biom3_tpu.io.orbax_io import CheckpointManager

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    # +1-shift into model ids happens here, once, on the host
    tok_train = tok_train + 1

    def make_batch(idx):
        return {
            "tokens": jnp.asarray(tok_train[idx]),
            "z_c": jnp.asarray(emb_train[idx]),
        }

    loader = BatchLoader(
        len(tok_train), batch_size, make_batch, seed=cfg.int("seed", 42)
    )
    logger = MetricLogger(args.output_dir)
    enter_eval = cfg.int("enter_eval", 1000)
    key = jax.random.key(cfg.int("seed", 42))

    done = False
    t0 = time.time()
    while not done:
        for batch in loader:
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, batch, sub)
            step = int(state.step)
            if step % 50 == 0 or step == 1:
                loss = float(aux["loss"])
                print(f"step {step}/{total_steps} loss={loss:.4f} "
                      f"({(time.time() - t0):.0f}s)")
                logger.log(step, {k: float(v) for k, v in aux.items()})
            if step % enter_eval == 0:
                if len(tok_val):
                    vb = {
                        "tokens": jnp.asarray(tok_val[:batch_size] + 1),
                        "z_c": jnp.asarray(emb_val[:batch_size]),
                    }
                    key, vk = jax.random.split(key)
                    vm = eval_fn(state.params, vb, vk)
                    print("  val: " + " ".join(
                        f"{k}={float(v):.4f}" for k, v in sorted(vm.items())
                    ))
                    logger.log(step, {f"val_{k}": float(v) for k, v in vm.items()})
                ckpt.save(step, state)
            if step >= total_steps:
                done = True
                break
    ckpt.save(int(state.step), state, wait=True)
    logger.close()
    if args.export_bin:
        import numpy as np

        from biom3_tpu.io.export import proteoscribe_params_to_torch
        from biom3_tpu.io.torch_load import save_torch_file

        src = (state.ema_params
               if args.export_params == "ema" and state.ema_params is not None
               else state.params)
        tree = jax.tree.map(np.asarray, {"params": src["params"]})
        # exporter emits the published 'transformer.*' key layout already
        save_torch_file(
            proteoscribe_params_to_torch(tree, model_cfg), args.export_bin
        )
        print(f"exported {args.export_params} params to {args.export_bin}")
    print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
