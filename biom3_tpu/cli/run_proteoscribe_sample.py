"""Stage-3 CLI: ProteoScribe conditional sequence generation.

Flag-compatible with the reference ``run_ProteoScribe_sample.py``
(--json_path --model_path --input_path --output_path).  Deviation from the
reference, documented: the reference accepts ``--output_path`` but never
writes it (SURVEY.md Q4); this CLI actually saves the generated sequences
(and still prints the dict like the reference).
"""

from __future__ import annotations

import argparse

from biom3_tpu.config import load_json_config
from biom3_tpu.io.torch_load import load_torch_file, save_torch_file
from biom3_tpu.pipeline.stage3 import ProteoScribeEngine


def parse_arguments():
    parser = argparse.ArgumentParser(description="BioM3 Inference Script (Stage 3)")
    parser.add_argument("--json_path", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--input_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=None,
                        help="sampling seed (defaults to config 'seed')")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="0 = deterministic argmax decoding")
    parser.add_argument("--legacy-batch-update", action="store_true",
                        help="reproduce the reference's batched-update quirk (Q5)")
    parser.add_argument("--positions-per-step", type=int, default=1,
                        help=">1 enables blocked any-order decoding "
                             "(k-fold fewer forwards; approximation)")
    parser.add_argument("--dtype", choices=["auto", "bf16", "f32"],
                        default="auto",
                        help="auto = bf16 serving path (whole-stack Pallas "
                             "kernel) on TPU, f32 parity path on CPU")
    parser.add_argument("--ff-quant", choices=["auto", "none", "int8"],
                        default="auto",
                        help="int8 = FF matmuls on the int8 MXU path "
                             "(drift-gated serving mode; bf16 path only)")
    parser.add_argument("--proj-quant", choices=["auto", "none", "int8"],
                        default="auto",
                        help="int8 = q/k/v/out projections on the int8 MXU "
                             "path (bf16 path only)")
    parser.add_argument("--top-k", type=int, default=None,
                        help="truncate sampling to the k most likely tokens "
                             "(framework extension; reference samples full)")
    parser.add_argument("--top-p", type=float, default=None,
                        help="nucleus sampling threshold (framework extension)")
    parser.add_argument("--decode-order", choices=["path", "confidence"],
                        default="path",
                        help="path = the reference's random order; "
                             "confidence = MaskGIT-style easy-first "
                             "(framework extension, recommended with "
                             "--positions-per-step > 1)")
    parser.add_argument("--sampler", choices=["ardm", "maskgit"],
                        default="ardm",
                        help="ardm = the reference's L sequential steps; "
                             "maskgit = parallel iterative re-masking "
                             "(--maskgit-steps forwards total — framework "
                             "extension, certify before production use)")
    parser.add_argument("--maskgit-steps", type=int, default=16)
    return parser.parse_args()


def main() -> None:
    import jax
    import jax.numpy as jnp

    args = parse_arguments()
    config = load_json_config(args.json_path)
    if args.dtype == "auto":
        on_accel = jax.devices()[0].platform != "cpu"
        dtype = jnp.bfloat16 if on_accel else jnp.float32
    else:
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    engine = ProteoScribeEngine(
        config,
        args.model_path,
        dtype=dtype,
        temperature=args.temperature,
        legacy_batch_update=args.legacy_batch_update,
        positions_per_step=args.positions_per_step,
        # "auto" = engine default (int8 on the TPU stack path, r3)
        ff_quant=None if args.ff_quant == "auto" else args.ff_quant,
        proj_quant=(None if args.proj_quant == "auto"
                    else args.proj_quant),
        top_k=args.top_k,
        top_p=args.top_p,
        decode_order=args.decode_order,
        sampler_mode=args.sampler,
        maskgit_steps=args.maskgit_steps,
    )

    embedding_dataset = load_torch_file(args.input_path)
    seed = args.seed if args.seed is not None else config.int("seed", 0)
    design_sequence_dict = engine.generate_sequences(
        embedding_dataset["z_c"], seed=seed
    )

    print(f"{design_sequence_dict=}")
    save_torch_file(design_sequence_dict, args.output_path)
    print(f"Generated sequences saved to {args.output_path}")


if __name__ == "__main__":
    main()
