"""Shared stage-config builders for the benchmark/sweep tools.

`tools/bench_serving.py` and `tools/run_sweep.py` drive the same
three-stage pipeline at the same shapes; the config dicts live here so
the reference serving dims are defined once.  No published checkpoints
or tokenizer files exist in this sandbox, so callers pair these with the
synthetic wordpiece vocab (`tokenizers/synthetic.py`) and random-init
weights — dims match the published models (SURVEY.md), so the timing is
representative.
"""

from __future__ import annotations

TINY_S1 = {
    "protein_encoder_embedding": 16, "text_encoder_embedding": 16,
    "esm_num_layers": 1, "esm_attention_heads": 2,
    "bert_num_layers": 1, "bert_num_heads": 2,
    "bert_intermediate_size": 32,
    "bert_max_position_embeddings": 32, "proj_embedding_dim": 8,
    "temperature": 0.8, "text_max_length": 32,
}
TINY_S2 = {"emb_dim": 8, "hid_dim": 16, "dropout": 0.0, "loss_type": "MMD"}

# published serving dims: text tower = PubMedBERT-base, Stage-3 =
# 16-layer/512-d ProteoScribe at L=1024
FULL_S1 = {
    "protein_encoder_embedding": 1280, "text_encoder_embedding": 768,
    "esm_num_layers": 1, "esm_attention_heads": 2,  # text_only path
    "bert_num_layers": 12, "bert_num_heads": 12,
    "bert_intermediate_size": 3072,
    "bert_max_position_embeddings": 512, "proj_embedding_dim": 512,
    "temperature": 0.8, "text_max_length": 512,
}
FULL_S2 = {"emb_dim": 512, "hid_dim": 640, "dropout": 0.0,
           "loss_type": "MMD"}


def stage_configs(tiny: bool, *, batch: int, replicas: int = 2) -> tuple:
    """→ (s1_cfg, s2_cfg, s3_cfg) dicts; caller adds the tokenizer keys
    (``bert_vocab_size``, ``text_model_path``)."""
    if tiny:
        s3 = {
            "num_replicas": replicas, "batch_size_sample": batch,
            "diffusion_steps": 64, "seed": 0, "task": "proteins",
            "text_emb_dim": 8, "transformer_dim": 32,
            "transformer_heads": 4, "transformer_depth": 2,
            "transformer_blocks": 1, "transformer_local_heads": 2,
            "transformer_local_size": 16, "facilitator": "MMD",
            "context_window_size": 64, "image_size": 8, "num_classes": 29,
        }
        return dict(TINY_S1), dict(TINY_S2), s3
    s3 = {
        "num_replicas": replicas, "batch_size_sample": batch,
        "diffusion_steps": 1024, "seed": 0, "task": "proteins",
        "text_emb_dim": 512, "transformer_dim": 512,
        "transformer_heads": 16, "transformer_depth": 16,
        "transformer_blocks": 1, "transformer_local_heads": 8,
        "transformer_local_size": 128, "facilitator": "MMD",
        "context_window_size": 1024, "image_size": 32, "num_classes": 29,
    }
    return dict(FULL_S1), dict(FULL_S2), s3
