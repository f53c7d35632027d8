"""Flax → torch state-dict exporters (the converters' inverses).

Round-trip interop: models trained in this framework export to the
reference's checkpoint formats, loadable by the original PyTorch code
(``Stage1_source/model.py`` / ``Stage3_source/cond_diff_transformer_layer.py``).
"""

from __future__ import annotations

import numpy as np

from biom3_tpu.config import FacilitatorConfig, ProteoScribeConfig


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(x)))


def facilitator_params_to_torch(params: dict, cfg: FacilitatorConfig) -> dict:
    """Flax Facilitator params → ``main.{0,3}.weight_{g,v}/bias`` state dict
    (torch weight_norm modules recompute ``weight`` from g·v, so only the
    reparameterized tensors are stored — matching the published .bin)."""
    p = params["params"]
    out = {}
    for flax_name, torch_idx in (("fc1", "0"), ("fc2", "3")):
        v = np.asarray(p[flax_name]["v"], np.float32)
        g = np.asarray(p[flax_name]["g"], np.float32).reshape(())
        out[f"main.{torch_idx}.weight_v"] = v
        out[f"main.{torch_idx}.weight_g"] = g
        out[f"main.{torch_idx}.bias"] = np.asarray(p[flax_name]["b"], np.float32)
    return out


def proteoscribe_params_to_torch(params: dict, cfg: ProteoScribeConfig) -> dict:
    """Flax ProteoScribe params → reference DiffTransformer state dict."""
    p = params["params"]
    sd: dict = {}
    sd["transformer.x_emb_NN.weight"] = np.asarray(p["tok_emb"]["embedding"])
    sd["transformer.axial_pos_emb.weights_0"] = np.asarray(p["ax_row"]).reshape(
        1, cfg.max_seq_len // cfg.local_window, 1, cfg.dim
    )
    sd["transformer.axial_pos_emb.weights_1"] = np.asarray(p["ax_col"]).reshape(
        1, 1, cfg.local_window, cfg.dim
    )

    def dense(prefix: str, leaf: dict) -> None:
        sd[f"{prefix}.weight"] = _t(leaf["kernel"])
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = np.asarray(leaf["bias"])

    if "y_mlp" in p:
        dense("transformer.y_mlp.0", p["y_mlp"]["fc1"])
        dense("transformer.y_mlp.2", p["y_mlp"]["fc2"])
    dense("transformer.mlp.0", p["time_mlp"]["fc1"])
    dense("transformer.mlp.2", p["time_mlp"]["fc2"])

    def ln(prefix: str, leaf: dict) -> None:
        sd[f"{prefix}.weight"] = np.asarray(leaf["scale"])
        sd[f"{prefix}.bias"] = np.asarray(leaf["bias"])

    for bi in range(cfg.n_blocks):
        for li in range(cfg.depth):
            layer = p[f"layer_{bi}_{li}"]
            base = f"transformer.transformer_blocks.{bi}.{li}.layers.layers.0"
            ln(f"{base}.0.norm", layer["attn_norm"])
            for name in ("to_q", "to_k", "to_v"):
                sd[f"{base}.0.fn.{name}.weight"] = _t(
                    layer["attn"][f"{name}_kernel"]
                )
            dense(f"{base}.0.fn.to_out", layer["attn"]["to_out"])
            ln(f"{base}.1.norm", layer["ff_norm"])
            dense(f"{base}.1.fn.fn.w1", layer["ff_w1"])
            dense(f"{base}.1.fn.fn.w2", layer["ff_w2"])

    ln("transformer.norm", p["final_norm"])
    dense("transformer.out", p["out_proj"])
    return sd
