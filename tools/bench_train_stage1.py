"""On-chip full-size Stage-1 (PenCL) training-step proof + throughput.

Runs the REAL recipe at reference scale on a single chip: ESM2-650M +
PubMedBERT towers (bf16 compute, f32 params/optimizer), contrastive +
MLM losses per ``dataset_type``, per-group AdamW LRs, remat'd tower layers
(without remat the ~12 GB of f32 params/moments/grads leave no room for
33 layers of stored activations in 16 GB HBM).

The reference's equivalent step is ``pfam_PL_PEN_CL.training_step``
(Stage1_source/PL_wrapper.py:931) on A100s; this proves the TPU-native
replacement compiles and steps on one chip and reports ms/step + tokens/s
+ train MFU.

Run: python tools/bench_train_stage1.py [--batch 4] [--steps 4]
     [--dataset-type default|pfam]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import Config, PenCLConfig
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.training.stage1_task import (
    make_stage1_optimizer,
    make_stage1_train_step,
)
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.flops import pencl_pair_forward_flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--dataset-type", default="default",
                    choices=["default", "masked", "pfam", "pfam_ablated"])
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-mode", default=None,
                    choices=["full", "dots", "none"],
                    help="overrides --no-remat: full = recompute all, "
                         "dots = keep matmul outputs (models.remat)")
    ap.add_argument("--peak", type=float, default=190.0,
                    help="measured bf16 GEMM TF/s for the MFU estimate")
    ap.add_argument("--layer-mode", default="xla",
                    choices=["xla", "layer_block", "layer_block_bf16dq"],
                    help="layer_block = fused ESM2 layer custom-VJP kernels "
                         "(ops/pallas/esm2_block_tpu; backward recomputes "
                         "from layer inputs, so remat is forced off)")
    ap.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "adafactor"],
                    help="optimizer-state compression A/B (VERDICT r4 #2): "
                         "adafactor's factored second moments free ~5.9 GB "
                         "of HBM at 762M params vs AdamW")
    ap.add_argument("--moment-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="adamw first-moment dtype (bfloat16 frees ~1.5 GB "
                         "at 762M params)")
    args = ap.parse_args()

    if args.remat_mode is not None:
        remat = {"full": True, "dots": "dots", "none": False}[args.remat_mode]
    else:
        remat = not args.no_remat
    attn_impl = "xla"
    if args.layer_mode == "layer_block":
        attn_impl, remat = "layer-block", False
    elif args.layer_mode == "layer_block_bf16dq":
        attn_impl, remat = "layer-block-bf16dq", False
    cfg = PenCLConfig()
    B = args.batch
    model = PenCL(cfg, dtype=jnp.bfloat16, remat=remat, attn_impl=attn_impl)
    rng = np.random.default_rng(0)

    def toks(v, L):
        return jnp.asarray(rng.integers(4, v, (B, L)).astype(np.int32))

    batch = {
        "text_tokens": toks(cfg.bert.vocab_size, cfg.text_max_length),
        "protein_tokens": toks(30, cfg.seq_max_length),
    }
    if args.dataset_type in ("masked", "pfam", "pfam_ablated"):
        batch["text_tokens_masked"] = batch["text_tokens"]
        batch["protein_tokens_masked"] = batch["protein_tokens"]
    if args.dataset_type in ("pfam", "pfam_ablated"):
        batch["pfam_text_tokens"] = toks(cfg.bert.vocab_size, cfg.text_max_length)
        batch["pfam_protein_tokens"] = toks(30, cfg.seq_max_length)
        batch["pfam_text_tokens_masked"] = batch["pfam_text_tokens"]
        batch["pfam_protein_tokens_masked"] = batch["pfam_protein_tokens"]

    print(f"device: {jax.devices()[0]}  B={B} type={args.dataset_type} "
          f"remat={remat}")
    t0 = time.perf_counter()
    # host-side init via eval_shape: on-device init of the 762M-param
    # towers costs ~19 min through the tunnel's per-dispatch latency
    # (measured 1160 s, 2026-08-19); the bench times train steps, not init
    shapes = jax.eval_shape(
        lambda k, xt, xp: model.init(k, xt, xp,
                                     method=PenCL.init_all_params),
        jax.random.key(0), batch["text_tokens"][:1],
        batch["protein_tokens"][:1],
    )
    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(treedef, [
        jnp.asarray((rng.standard_normal(l.shape) * 0.02).astype(l.dtype))
        for l in leaves
    ])
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"init: {n_params/1e6:.0f}M params in {time.perf_counter()-t0:.0f}s")

    opt_cfg = Config({"protein_encoder_lr": 5e-4, "text_encoder_lr": 5e-4,
                      "head_lr": 5e-4, "weight_decay": "5e-7",
                      "optimizer": args.optimizer,
                      "moment_dtype": args.moment_dtype})
    tx = make_stage1_optimizer(opt_cfg)
    state = TrainState.create(params, tx)
    step = make_stage1_train_step(
        model.apply, tx, temperature=cfg.temperature,
        dataset_type=args.dataset_type,
        text_mask_id=4, protein_mask_id=32, with_metrics=False,
    )

    import functools

    # donate the carried state: without aliasing, input+output params/moments
    # double-buffer ~9 GB of f32 state → 18.5 GB > 15.75 GB HBM
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, key):
        def body(carry, k):
            st, _ = carry
            st, aux = step(st, batch, k)
            return (st, aux["loss"]), ()
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, args.steps)
        )
        return st, loss

    t0 = time.perf_counter()
    state, loss = run_n(state, jax.random.key(1))
    loss = float(np.asarray(loss))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(args.runs):
        t0 = time.perf_counter()
        state, l_ = run_n(state, jax.random.key(2 + i))
        np.asarray(l_)
        best = min(best, time.perf_counter() - t0)
    ms = best / args.steps * 1e3
    pairs = B * (2 if args.dataset_type in ("pfam", "pfam_ablated") else 1)
    # fwd+bwd ≈ 3x forward; MLM variants run the towers twice more
    mult = {"default": 1, "masked": 2, "pfam": 2, "pfam_ablated": 2}[
        args.dataset_type]
    tf_step = 3 * mult * pairs * pencl_pair_forward_flops(cfg) / 1e12
    print(f"{ms:8.1f} ms/step  {pairs/ (best/args.steps):6.2f} pairs/s  "
          f"~{tf_step/(best/args.steps):5.1f} TF/s "
          f"(MFU ~{tf_step/(best/args.steps)/args.peak*100:.0f}%)  "
          f"loss={loss:.4f}  (compile {compile_s:.0f}s)  "
          f"[B={B} {args.optimizer}"
          f"{'/bf16-mu' if args.moment_dtype == 'bfloat16' else ''}]")


if __name__ == "__main__":
    main()
