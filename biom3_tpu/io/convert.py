"""Torch-checkpoint → Flax-pytree converters for the published BioM3 weights.

Each converter maps a torch ``state_dict`` (as numpy, via
``biom3_tpu.io.torch_load``) onto the parameter tree of the corresponding
Flax module.  Linear weights transpose from torch (out, in) to Flax kernels
(in, out); LayerNorm weight/bias become scale/bias; embeddings copy directly.

Key layouts follow the reference model definitions:
  * Facilitator: ``Stage1_source/model.py:473-493`` (``main.{0,3}.weight_{g,v}``).
  * ProteoScribe: ``Stage3_source/cond_diff_transformer_layer.py`` wrapping
    ``linear_attention_transformer==0.19.1`` (per-layer
    ``transformer_blocks.{b}.{j}.layers.0.{0,1}...``) — converters accept both
    raw ``.bin`` state dicts and Lightning ``.ckpt`` (``model.`` prefixed).
"""

from __future__ import annotations

import numpy as np

from biom3_tpu.config import FacilitatorConfig, ProteoScribeConfig
from biom3_tpu.io.torch_load import strip_prefix, unwrap_checkpoint


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x))


def facilitator_params_from_torch(state_dict: dict, cfg: FacilitatorConfig) -> dict:
    """Map Facilitator ``main.{0,3}.{weight_g,weight_v,bias}`` → Flax params."""
    sd = strip_prefix(unwrap_checkpoint(state_dict), "model.")
    sd = strip_prefix(sd, "main.")

    def wn(idx: str) -> dict:
        return {
            "v": np.asarray(sd[f"{idx}.weight_v"], np.float32),
            "g": np.asarray(sd[f"{idx}.weight_g"], np.float32).reshape(()),
            "b": np.asarray(sd[f"{idx}.bias"], np.float32),
        }

    return {"params": {"fc1": wn("0"), "fc2": wn("3")}}


def _dense(sd: dict, key: str) -> dict:
    out = {"kernel": _t(np.asarray(sd[f"{key}.weight"], np.float32))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def _layernorm(sd: dict, key: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }


def proteoscribe_params_from_torch(state_dict: dict, cfg: ProteoScribeConfig) -> dict:
    """Map the Stage-3 DiffTransformer state dict → ProteoScribe Flax params."""
    sd = unwrap_checkpoint(state_dict)
    sd = strip_prefix(sd, "model.")        # Lightning wrapper
    sd = strip_prefix(sd, "transformer.")  # DiffTransformer.transformer

    params: dict = {}
    params["tok_emb"] = {
        "embedding": np.asarray(sd["x_emb_NN.weight"], np.float32)
    }
    params["ax_row"] = np.asarray(sd["axial_pos_emb.weights_0"], np.float32).reshape(
        cfg.max_seq_len // cfg.local_window, cfg.dim
    )
    params["ax_col"] = np.asarray(sd["axial_pos_emb.weights_1"], np.float32).reshape(
        cfg.local_window, cfg.dim
    )
    if "y_mlp.0.weight" in sd:  # absent in the unconditional variant
        # (ref Stage3_source/diff_transformer_layer.py:145-168 — time-only)
        params["y_mlp"] = {
            "fc1": _dense(sd, "y_mlp.0"), "fc2": _dense(sd, "y_mlp.2")
        }
    params["time_mlp"] = {"fc1": _dense(sd, "mlp.0"), "fc2": _dense(sd, "mlp.2")}

    for bi in range(cfg.n_blocks):
        for li in range(cfg.depth):
            base = f"transformer_blocks.{bi}.{li}.layers.layers.0"
            layer = {
                "attn_norm": _layernorm(sd, f"{base}.0.norm"),
                "attn": {
                    # q/k/v kernels are flat params (in, out) in the Flax
                    # tree (SplitHeadAttention supports fused-QKV matmuls)
                    "to_q_kernel": _t(np.asarray(sd[f"{base}.0.fn.to_q.weight"], np.float32)),
                    "to_k_kernel": _t(np.asarray(sd[f"{base}.0.fn.to_k.weight"], np.float32)),
                    "to_v_kernel": _t(np.asarray(sd[f"{base}.0.fn.to_v.weight"], np.float32)),
                    "to_out": _dense(sd, f"{base}.0.fn.to_out"),
                },
                "ff_norm": _layernorm(sd, f"{base}.1.norm"),
                "ff_w1": _dense(sd, f"{base}.1.fn.fn.w1"),
                "ff_w2": _dense(sd, f"{base}.1.fn.fn.w2"),
            }
            params[f"layer_{bi}_{li}"] = layer

    params["final_norm"] = _layernorm(sd, "norm")
    params["out_proj"] = _dense(sd, "out")
    return {"params": params}


def stack_proteoscribe_layers(params: dict, cfg: ProteoScribeConfig) -> dict:
    """Unrolled param tree → scan-over-layers tree (``scan_layers=True``).

    ``layer_{b}_{l}`` subtrees stack into ``block_{b}/layer`` with a leading
    depth axis (matching ``nn.scan(variable_axes={"params": 0})``)."""
    p = dict(params["params"])
    for bi in range(cfg.n_blocks):
        layers = [p.pop(f"layer_{bi}_{li}") for li in range(cfg.depth)]
        import jax

        p[f"block_{bi}"] = {
            "layer": jax.tree.map(lambda *xs: np.stack(xs), *layers)
        }
    return {"params": p}


def unstack_proteoscribe_layers(params: dict, cfg: ProteoScribeConfig) -> dict:
    """Inverse of ``stack_proteoscribe_layers``."""
    import jax

    p = dict(params["params"])
    for bi in range(cfg.n_blocks):
        stacked = p.pop(f"block_{bi}")["layer"]
        for li in range(cfg.depth):
            p[f"layer_{bi}_{li}"] = jax.tree.map(
                lambda x, li=li: np.asarray(x)[li], stacked
            )
    return {"params": p}
