"""Stage-1 training CLI: PenCL contrastive + MLM training on TPU.

Driven by ``stage1_config.json`` (the reference's Lightning launch lived
outside the repo).  Loads SwissProt (and optionally Pfam) caption/sequence
CSVs, tokenizes in batched host pipelines, and runs the global-batch
contrastive step with per-tower learning rates over a (dp, fsdp) mesh.
Checkpoints via orbax; pretrained towers can be seeded from the published
fair-esm/HF weights via --esm_weights/--bert_weights.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import PenCLConfig, load_json_config
from biom3_tpu.data.loader import BatchLoader
from biom3_tpu.data.stage1_data import TextSeqPairingDataset
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.training.stage1_task import (
    make_stage1_optimizer,
    make_stage1_train_step,
)
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.logging import MetricLogger


def parse_arguments():
    p = argparse.ArgumentParser(description="BioM3 Stage-1 training")
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--data_path", type=str, default=None,
                   help="SwissProt CSV (overrides config data_path)")
    p.add_argument("--pfam_data_path", type=str, default=None)
    p.add_argument("--esm_weights", type=str, default=None,
                   help="fair-esm .pt to seed the protein tower")
    p.add_argument("--bert_weights", type=str, default=None,
                   help="HF pytorch_model.bin to seed the text tower")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None,
                   help="override the config's batch_size (ref default 80 "
                        "assumes a multi-GPU global batch).  Single v5e "
                        "chip, full-size towers, layer_block kernels: "
                        "f32-AdamW states cap it at 16 (21.9 pairs/s, "
                        "~56%% MFU); with --optimizer adafactor B=32 runs "
                        "at 23.1 pairs/s ~58%% MFU, and --moment_dtype "
                        "bfloat16 unlocks B=24 with Adam semantics "
                        "(22.5 pairs/s) — r5 chip logs r5_train_s1_*.  "
                        "Shard over a mesh for larger global batches.")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--optimizer", choices=["adamw", "adafactor"],
                   default=None,
                   help="override the config's optimizer; adafactor's "
                        "factored second moments lift the single-chip "
                        "batch ceiling (see --batch_size)")
    p.add_argument("--moment_dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="adamw first-moment dtype; bfloat16 frees ~1.5 GB "
                        "at full size")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize tower layers in the backward pass — "
                        "required to fit full-size (650M-tower) training on "
                        "a single 16 GB chip (tools/bench_train_stage1.py); "
                        "numerically identical (test_stage1_remat_matches_"
                        "plain)")
    p.add_argument("--layer-mode", default="auto",
                   choices=["auto", "xla", "layer_block", "layer_block_bf16dq"],
                   help="layer_block = fused ESM2 layer custom-VJP kernels "
                        "(ops/pallas/esm2_block_tpu) — the TPU training "
                        "fast path; backward recomputes from layer inputs, "
                        "so --remat is ignored with it; the bf16dq variant "
                        "halves the backward's dqkv scratch (the plain mode "
                        "auto-picks it when the f32 buffer exceeds VMEM). "
                        "auto (default) = layer_block on TPU in bf16 when "
                        "the ESM2 shape qualifies (on-chip A/B 2026-08-19: "
                        "226.5 vs 335.4 ms/step at full size, B=4), else "
                        "xla")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export_bin", type=str, default=None,
                   help="after training, also write the params as a "
                        "published pfam_PEN_CL-layout .bin — directly "
                        "servable via run_pencl_inference")
    return p.parse_args()


def main() -> None:
    args = parse_arguments()
    cfg = load_json_config(args.json_path)
    if args.data_path:
        cfg.data_path = args.data_path
    model_cfg = PenCLConfig.from_stage_config(cfg)

    df = TextSeqPairingDataset.load_swissprot_csv(cfg)
    dataset = TextSeqPairingDataset(cfg, df)
    pfam_dataset = None
    if args.pfam_data_path or cfg.str_or_none("pfam_data_path"):
        import pandas as pd

        pfam_df = pd.read_csv(args.pfam_data_path or cfg.pfam_data_path)
        pfam_dataset = TextSeqPairingDataset(
            cfg, pfam_df, text_tokenizer=dataset.text_tokenizer
        )
    print(f"swissprot: {len(dataset)} pairs"
          + (f", pfam: {len(pfam_dataset)}" if pfam_dataset else ""))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    layer_mode = args.layer_mode
    if layer_mode == "auto":
        # Data-driven default (on-chip A/B 2026-08-19, full-size B=4:
        # layer_block 226.5 ms/step / ~45% MFU vs xla+remat 335.4 / ~30%):
        # the fused kernels when they apply — TPU backend, bf16 compute,
        # and the esm2_block_tpu shape contract (E % 128 == 0, E % heads
        # == 0; ESM2 itself is dropout-free, so the kernels compose with
        # the recipe's projection-head/BERT dropout).
        esm = model_cfg.esm
        qualifies = (
            jax.devices()[0].platform not in ("cpu",)
            and dtype == jnp.bfloat16
            and esm.embed_dim % 128 == 0
            and esm.embed_dim % esm.attention_heads == 0
        )
        layer_mode = "layer_block" if qualifies else "xla"
        print(f"layer-mode auto -> {layer_mode}")
    attn_impl = {
        "layer_block": "layer-block",
        "layer_block_bf16dq": "layer-block-bf16dq",
    }.get(layer_mode, "xla")
    model = PenCL(model_cfg, dtype=dtype,
                  remat=args.remat and layer_mode == "xla",
                  attn_impl=attn_impl)
    params = model.init(
        jax.random.key(cfg.int("seed", 42)),
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        method=PenCL.init_all_params,
    )
    # seed towers from published weights when provided
    if args.esm_weights:
        from biom3_tpu.io.convert_stage1 import esm2_params_from_torch
        from biom3_tpu.io.torch_load import load_torch_file

        params["params"]["protein_encoder"] = esm2_params_from_torch(
            load_torch_file(args.esm_weights), model_cfg.esm
        )
    if args.bert_weights:
        from biom3_tpu.io.convert_stage1 import bert_params_from_torch
        from biom3_tpu.io.torch_load import load_torch_file

        params["params"]["text_encoder"] = bert_params_from_torch(
            load_torch_file(args.bert_weights), model_cfg.bert
        )

    # the reference config carries dataset_type='default' (a DataModule
    # class selector) next to model_type='pfam'; the pfam wrapper itself
    # only accepts pfam/pfam_ablated (PL_wrapper.py:1078-1089) — map
    # accordingly so the shipped config trains the full pfam objective
    dataset_type = cfg.get("dataset_type", "pfam")
    if cfg.get("model_type", "pfam") == "pfam" and dataset_type not in (
        "pfam", "pfam_ablated"
    ):
        print(f"model_type=pfam: mapping dataset_type {dataset_type!r} -> 'pfam'")
        dataset_type = "pfam"
    if args.optimizer:
        cfg.optimizer = args.optimizer
    if args.moment_dtype:
        cfg.moment_dtype = args.moment_dtype
    batch_size = (args.batch_size if args.batch_size
                  else cfg.int("batch_size", 80))
    if (batch_size > 16 and jax.device_count() == 1
            and cfg.get("optimizer", "adamw") == "adamw"
            and cfg.get("moment_dtype") in (None, "None", "float32")):
        print("note: batch_size > 16 with f32-AdamW states OOMs a single "
              "16G chip at full size — pass --optimizer adafactor "
              "(B=32 measured 23.1 pairs/s) or --moment_dtype bfloat16 "
              "(B=24), or shard over a mesh", flush=True)
    tx = make_stage1_optimizer(cfg)
    state = TrainState.create(params, tx)
    # donate the state: without aliasing, input+output params/moments
    # double-buffer the ~9 GB f32 training state of the full-size towers
    step_fn = jax.jit(make_stage1_train_step(
        model.apply, tx,
        temperature=model_cfg.temperature,
        dataset_type=dataset_type,
        text_mask_id=dataset.text_tokenizer.mask_token_id,
        protein_mask_id=dataset.alphabet.mask_idx,
    ), donate_argnums=(0,))

    rng = np.random.default_rng(cfg.int("seed", 42))

    # The pfam CSV must be ROW-ALIGNED with the SwissProt CSV: the loss
    # geometry pairs swiss row i with pfam row i as same-family positives
    # (compute_intra_loss positives sit half the global batch away; the
    # inter-loss mask treats the (i, i+B) pairs as duplicates — ref
    # PL_wrapper.py:969-972 yields them from one aligned dataset).
    if pfam_dataset is not None and len(pfam_dataset) != len(dataset):
        raise SystemExit(
            "pfam CSV must be row-aligned with the SwissProt CSV "
            f"(got {len(pfam_dataset)} vs {len(dataset)} rows)"
        )

    def make_batch(idx):
        b = dataset.get_batch(idx, with_masks=True, rng=rng)
        out = {
            "text_tokens": jnp.asarray(b["text_tokens"]),
            "protein_tokens": jnp.asarray(b["protein_tokens"]),
            "text_tokens_masked": jnp.asarray(b["text_tokens_masked"]),
            "protein_tokens_masked": jnp.asarray(b["protein_tokens_masked"]),
        }
        # same indices → aligned family positives (self-paired when no pfam
        # dataset is given, which makes intra-loss positives identical
        # samples — only meaningful as a smoke/dev mode)
        src = pfam_dataset or dataset
        pb = src.get_batch(idx, with_masks=True, rng=rng)
        out.update({
            "pfam_text_tokens": jnp.asarray(pb["text_tokens"]),
            "pfam_protein_tokens": jnp.asarray(pb["protein_tokens"]),
            "pfam_text_tokens_masked": jnp.asarray(pb["text_tokens_masked"]),
            "pfam_protein_tokens_masked": jnp.asarray(pb["protein_tokens_masked"]),
        })
        return out

    loader = BatchLoader(len(dataset), batch_size, make_batch, seed=cfg.int("seed", 42))
    logger = MetricLogger(args.output_dir)

    from biom3_tpu.io.orbax_io import CheckpointManager

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    total = args.max_steps or cfg.int("epochs", 10) * len(loader)
    done = False
    key = jax.random.key(cfg.int("seed", 42) + 1)  # train-mode dropout stream
    while not done:
        for batch in loader:
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, batch, sub)
            step = int(state.step)
            if step % 20 == 0 or step == 1:
                print(f"step {step}/{total} loss={float(aux['loss']):.4f} "
                      f"f1={float(aux.get('total_f1', 0)):.3f}")
                logger.log(step, {k: float(v) for k, v in aux.items()})
            if step % 500 == 0:
                ckpt.save(step, state)
            if step >= total:
                done = True
                break
    ckpt.save(int(state.step), state, wait=True)
    logger.close()
    if args.export_bin:
        from biom3_tpu.io.export import pencl_params_to_torch
        from biom3_tpu.io.torch_load import save_torch_file

        tree = jax.tree.map(np.asarray, {"params": state.params["params"]})
        save_torch_file(
            pencl_params_to_torch(tree, model_cfg), args.export_bin
        )
        print(f"exported params to {args.export_bin}")
    print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
