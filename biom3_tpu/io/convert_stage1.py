"""Torch → Flax converters for Stage-1 (PenCL) weights.

Handles three checkpoint layouts:
  * the published ``BioM3_PenCL_epoch20.bin`` — a full ``pfam_PEN_CL`` state
    dict with ``protein_encoder.model.*`` (fair-esm ESM2 names),
    ``text_encoder.model.*`` (HF BertForMaskedLM names) and
    ``protein_projection.* / text_projection.*`` heads
    (ref Stage1_source/model.py:178-207),
  * a raw fair-esm ``esm2_*.pt`` (``{"model": state_dict, ...}``),
  * a raw HF BERT ``pytorch_model.bin`` (``bert.* / cls.*``).
"""

from __future__ import annotations

import numpy as np

from biom3_tpu.config import BertConfig, ESM2Config, PenCLConfig
from biom3_tpu.io.torch_load import strip_prefix, unwrap_checkpoint


def _t(x):
    return np.ascontiguousarray(np.transpose(np.asarray(x, np.float32)))


def _dense(sd, key):
    out = {"kernel": _t(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _ln(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def _embed(sd, key):
    return {"embedding": np.asarray(sd[f"{key}.weight"], np.float32)}


# --- ESM2 (fair-esm naming) -------------------------------------------------


def esm2_params_from_torch(state_dict: dict, cfg: ESM2Config) -> dict:
    sd = unwrap_checkpoint(state_dict)
    if "model" in sd and isinstance(sd["model"], dict):  # raw fair-esm .pt
        sd = sd["model"]
    # shipped fair-esm ESM2 .pt files prefix trunk keys with
    # "encoder.sentence_encoder." (stripped by fair-esm's own loader)
    sd = strip_prefix(sd, "encoder.sentence_encoder.")
    sd = strip_prefix(sd, "encoder.")

    p: dict = {"embed_tokens": _embed(sd, "embed_tokens")}
    for i in range(cfg.num_layers):
        b = f"layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{b}.self_attn.out_proj"),
            },
            "self_attn_layer_norm": _ln(sd, f"{b}.self_attn_layer_norm"),
            "fc1": _dense(sd, f"{b}.fc1"),
            "fc2": _dense(sd, f"{b}.fc2"),
            "final_layer_norm": _ln(sd, f"{b}.final_layer_norm"),
        }
    p["emb_layer_norm_after"] = _ln(sd, "emb_layer_norm_after")
    if "lm_head.dense.weight" in sd:
        p["lm_head_dense"] = _dense(sd, "lm_head.dense")
        p["lm_head_layer_norm"] = _ln(sd, "lm_head.layer_norm")
        p["lm_head_bias"] = np.asarray(sd["lm_head.bias"], np.float32)
    return p


# --- BERT (HF naming) -------------------------------------------------------


def bert_params_from_torch(state_dict: dict, cfg: BertConfig) -> dict:
    sd = unwrap_checkpoint(state_dict)

    emb = "bert.embeddings"
    enc = "bert.encoder.layer"
    p: dict = {
        "word_embeddings": _embed(sd, f"{emb}.word_embeddings"),
        "position_embeddings": _embed(sd, f"{emb}.position_embeddings"),
        "token_type_embeddings": _embed(sd, f"{emb}.token_type_embeddings"),
        "embeddings_norm": _ln(sd, f"{emb}.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        b = f"{enc}.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, f"{b}.attention.self.query"),
                "key": _dense(sd, f"{b}.attention.self.key"),
                "value": _dense(sd, f"{b}.attention.self.value"),
            },
            "attention_output": _dense(sd, f"{b}.attention.output.dense"),
            "attention_norm": _ln(sd, f"{b}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{b}.intermediate.dense"),
            "output": _dense(sd, f"{b}.output.dense"),
            "output_norm": _ln(sd, f"{b}.output.LayerNorm"),
        }
    if "cls.predictions.transform.dense.weight" in sd:
        p["mlm_dense"] = _dense(sd, "cls.predictions.transform.dense")
        p["mlm_norm"] = _ln(sd, "cls.predictions.transform.LayerNorm")
        bias_key = (
            "cls.predictions.bias"
            if "cls.predictions.bias" in sd
            else "cls.predictions.decoder.bias"
        )
        p["mlm_bias"] = np.asarray(sd[bias_key], np.float32)
    return p


# --- projection heads + full PenCL -----------------------------------------


def projection_head_params_from_torch(sd: dict) -> dict:
    return {
        "projection": _dense(sd, "projection"),
        "fc": _dense(sd, "fc"),
        "layer_norm": _ln(sd, "layer_norm"),
    }


def pencl_params_from_torch(
    state_dict: dict, cfg: PenCLConfig, *, text_only: bool = False
) -> dict:
    """Published BioM3_PenCL .bin → full PenCL Flax param tree.

    ``text_only`` skips the 650M-param protein tower (serving paths that
    only embed captions — e.g. the e2e pipeline — never apply it, and Flax
    only looks up the params a call actually touches)."""
    sd = strip_prefix(unwrap_checkpoint(state_dict), "model.")  # Lightning

    def sub(prefix):
        return {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        }

    params = {
        "text_encoder": bert_params_from_torch(
            sub("text_encoder.model."), cfg.bert
        ),
        "text_projection": projection_head_params_from_torch(
            sub("text_projection.")
        ),
    }
    if not text_only:
        params["protein_encoder"] = esm2_params_from_torch(
            sub("protein_encoder.model."), cfg.esm
        )
        params["protein_projection"] = projection_head_params_from_torch(
            sub("protein_projection.")
        )
    return {"params": params}
