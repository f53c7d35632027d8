"""Stage-1 CLI: PenCL inference on the built-in 5-pair SwissProt demo.

Flag-compatible with the reference ``run_PenCL_inference.py``
(--json_path --model_path --output_path); prints the same score matrices and
saves the same ``{'sequence','text_prompts','z_t','z_p'}`` ``.pt`` dict.
"""

from __future__ import annotations

import argparse

import numpy as np

from biom3_tpu.cli.demo_data import DEMO_CAPTIONS, DEMO_SEQUENCES
from biom3_tpu.config import load_json_config
from biom3_tpu.io.torch_load import save_torch_file
from biom3_tpu.pipeline.stage1 import PenCLEngine, compute_scores


def parse_arguments():
    parser = argparse.ArgumentParser(description="BioM3 Inference Script (Stage 1)")
    parser.add_argument("--json_path", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    return parser.parse_args()


def main() -> None:
    args = parse_arguments()
    config = load_json_config(args.json_path)
    engine = PenCLEngine(config, args.model_path)

    z_t, z_p = engine.embed(DEMO_CAPTIONS, DEMO_SEQUENCES)
    scores = {k: np.asarray(v) for k, v in compute_scores(z_p, z_t).items()}

    embedding_dict = {
        "sequence": list(DEMO_SEQUENCES),
        "text_prompts": list(DEMO_CAPTIONS),
        "z_t": z_t,
        "z_p": z_p,
    }

    print("\n=== Inference Results ===")
    print(f"Shape of z_p (protein latent): {z_p.shape}")
    print(f"Shape of z_t (text latent): {z_t.shape}")
    print(f"\nMagnitudes of z_p vectors: {scores['z_p_magnitude']}")
    print(f"Magnitudes of z_t vectors: {scores['z_t_magnitude']}")
    print("\n=== Dot Product Scores Matrix ===")
    print(scores["dot_product_scores"])
    print("\n=== Normalized Probabilities ===")
    print("Protein-Normalized Probabilities (Softmax across Proteins for each Text):")
    print(scores["protein_given_text_probs"])
    print("\nText-Normalized Probabilities (Softmax across Texts for each Protein):")
    print(scores["text_given_protein_probs"])
    print("\n=== Homology Matrix (Dot Product of Normalized z_p) ===")
    print(scores["homology_matrix"])

    save_torch_file(embedding_dict, args.output_path)
    print(f"\nEmbeddings saved to {args.output_path}")


if __name__ == "__main__":
    main()
