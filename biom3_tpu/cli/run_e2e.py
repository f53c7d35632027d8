"""Unified text→protein pipeline CLI (capability the reference lacks).

Runs PenCL → Facilitator → ProteoScribe in one process on free-text prompts:
the reference requires three script invocations exchanging ``.pt`` files
(SURVEY.md §1); here stage outputs stay on device between stages.

  python -m biom3_tpu.cli.run_e2e \
      --stage1_json ... --stage1_model ... \
      --stage2_json ... --stage2_model ... \
      --stage3_json ... --stage3_model ... \
      --prompts prompts.txt --output_path out.pt
"""

from __future__ import annotations

import argparse

import numpy as np

from biom3_tpu.config import load_json_config
from biom3_tpu.io.torch_load import save_torch_file


def parse_arguments():
    p = argparse.ArgumentParser(description="BioM3 end-to-end text→protein")
    for stage in (1, 2, 3):
        p.add_argument(f"--stage{stage}_json", type=str, required=True)
        p.add_argument(f"--stage{stage}_model", type=str, required=True)
    p.add_argument("--prompts", type=str, required=True,
                   help="text file, one caption per line")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--num_replicas", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--positions_per_step", type=int, default=1,
                   help=">1 enables blocked fast decoding (k-fold fewer "
                        "forwards; certified in PARITY.md)")
    p.add_argument("--ff-quant", choices=["auto", "none", "int8"], default="auto",
                   help="Stage-3 FF matmuls on the int8 MXU path "
                        "(drift-gated serving mode)")
    p.add_argument("--proj-quant", choices=["auto", "none", "int8"], default="auto",
                   help="Stage-3 q/k/v/out projections on the int8 MXU path")
    p.add_argument("--decode_order", choices=["path", "confidence"],
                   default="path",
                   help="confidence = MaskGIT-style easy-first decoding "
                        "(recommended with --positions_per_step > 1)")
    p.add_argument("--sampler", choices=["ardm", "maskgit"], default="ardm",
                   help="maskgit = parallel iterative re-masking "
                        "(--maskgit_steps forwards instead of L)")
    p.add_argument("--maskgit_steps", type=int, default=16)
    p.add_argument("--inpaint_sequence", type=str, default=None,
                   help="partial design: fill each --inpaint_unknown "
                        "character conditioned on the prompt, preserving "
                        "the committed residues and length (instead of "
                        "free generation)")
    p.add_argument("--inpaint_unknown", type=str, default="?",
                   help="single character marking unknowns in "
                        "--inpaint_sequence")
    return p.parse_args()


def main() -> None:
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.stage2 import FacilitatorEngine
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine

    args = parse_arguments()
    with open(args.prompts) as f:
        prompts = [line.strip() for line in f if line.strip()]
    print(f"{len(prompts)} prompts")

    # text_only: skip converting/loading the 650M protein tower — the e2e
    # path only embeds captions
    s1 = PenCLEngine(
        load_json_config(args.stage1_json), args.stage1_model, text_only=True
    )
    z_t = np.asarray(s1.embed_text(prompts))
    print(f"z_t: {z_t.shape}")

    s2 = FacilitatorEngine(load_json_config(args.stage2_json), args.stage2_model)
    z_c = np.asarray(s2(z_t))
    print(f"z_c: {z_c.shape}")

    s3 = ProteoScribeEngine(
        load_json_config(args.stage3_json), args.stage3_model,
        temperature=args.temperature,
        positions_per_step=args.positions_per_step,
        # "auto" = engine default (int8 on the TPU stack path, r3)
        ff_quant=None if args.ff_quant == "auto" else args.ff_quant,
        proj_quant=(None if args.proj_quant == "auto"
                    else args.proj_quant),
        decode_order=args.decode_order,
        sampler_mode=args.sampler, maskgit_steps=args.maskgit_steps,
    )
    if args.inpaint_sequence is not None:
        import jax

        L = s3.config.max_seq_len
        n_rep = args.num_replicas or s3.stage_config.int("num_replicas", 5)
        masked = np.stack([
            s3.vocab.encode_partial(args.inpaint_sequence, L,
                                    args.inpaint_unknown)
        ] * n_rep)
        sequences = {f"replica_{k}": [] for k in range(n_rep)}
        for i, z in enumerate(np.atleast_2d(z_c)):
            ids = s3.inpaint_batch(
                masked, np.tile(z[None, :], (n_rep, 1)),
                jax.random.key(args.seed + i),
            )
            for k in range(n_rep):
                sequences[f"replica_{k}"].append(
                    s3.vocab.clean_sequence(s3.vocab.decode_ids(ids[k]))
                )
    else:
        sequences = s3.generate_sequences(
            z_c, num_replicas=args.num_replicas, seed=args.seed
        )

    result = {"prompts": prompts, "z_t": z_t, "z_c": z_c, "sequences": sequences}
    save_torch_file(result, args.output_path)
    print(f"Saved {args.output_path}")


if __name__ == "__main__":
    main()
