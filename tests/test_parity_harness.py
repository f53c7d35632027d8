"""tools/parity_check.py must execute end-to-end on synthetic checkpoints.

VERDICT r2 #8: the weight-parity harness is the single highest-value
command this project can ever run (the moment the published .bin files
appear), so it must not bit-rot.  This drives the REAL script as a
subprocess against tiny random-init checkpoints in the published key
layouts: every gate must execute and print a verdict line, and the
overall result must be FAIL (random weights cannot match the README
numbers) with exit code 1 — proving the harness, engines, converters,
and score plumbing all still work without the real weights.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).parents[1]


def _build_tiny_parity_ckpts(tmp_path):
    import torch
    import torch.nn as nn
    from torch.nn.utils.weight_norm import weight_norm
    from transformers import BertConfig as HFBertConfig, BertForMaskedLM
    from transformers import EsmConfig, EsmForMaskedLM

    from biom3_tpu.tokenizers.synthetic import write_synthetic_wordpiece
    from test_towers import _hf_esm_state_to_fairesm

    tok_dir = tmp_path / "tok"
    vocab_size = write_synthetic_wordpiece(tok_dir)

    torch.manual_seed(0)
    esm = EsmForMaskedLM(EsmConfig(
        vocab_size=33, mask_token_id=32, pad_token_id=1, hidden_size=16,
        num_attention_heads=2, num_hidden_layers=2, intermediate_size=64,
        position_embedding_type="rotary", token_dropout=True,
        emb_layer_norm_before=False, layer_norm_eps=1e-5,
    ))
    bert = BertForMaskedLM(HFBertConfig(
        vocab_size=vocab_size, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, hidden_act="gelu",
    ))
    sd = {}
    for k, v in _hf_esm_state_to_fairesm(esm.state_dict()).items():
        sd[f"protein_encoder.model.{k}"] = v
    sd["protein_encoder.model.lm_head.weight"] = sd[
        "protein_encoder.model.embed_tokens.weight"]
    for k, v in bert.state_dict().items():
        sd[f"text_encoder.model.{k}"] = v.detach().numpy()
    for tower in ("protein", "text"):
        head = {"projection": nn.Linear(16, 8), "fc": nn.Linear(8, 8),
                "layer_norm": nn.LayerNorm(8)}
        for name, mod in head.items():
            for pk, pv in mod.state_dict().items():
                sd[f"{tower}_projection.{name}.{pk}"] = pv.detach().numpy()
    torch.save(sd, tmp_path / "pencl.bin")

    (tmp_path / "s1.json").write_text(json.dumps({
        "protein_encoder_embedding": 16, "text_encoder_embedding": 16,
        "esm_num_layers": 2, "esm_attention_heads": 2, "rep_layer": 2,
        "bert_num_layers": 2, "bert_num_heads": 2,
        "bert_intermediate_size": 32, "bert_vocab_size": vocab_size,
        "bert_max_position_embeddings": 64, "proj_embedding_dim": 8,
        "temperature": 0.8, "text_max_length": 64,
        "text_model_path": str(tok_dir),
    }))

    fac = nn.Sequential(
        weight_norm(nn.Linear(8, 16), dim=None), nn.GELU(), nn.Dropout(0.0),
        weight_norm(nn.Linear(16, 8), dim=None),
    )
    torch.save({f"model.{k}": v for k, v in fac.state_dict().items()},
               tmp_path / "fac.bin")
    (tmp_path / "s2.json").write_text(json.dumps(
        {"emb_dim": 8, "hid_dim": 16, "dropout": 0.0, "loss_type": "MMD"}
    ))


def test_parity_check_executes_all_gates(tmp_path):
    _build_tiny_parity_ckpts(tmp_path)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_check.py"),
         "--pencl", str(tmp_path / "pencl.bin"),
         "--facilitator", str(tmp_path / "fac.bin"),
         "--stage1_json", str(tmp_path / "s1.json"),
         "--stage2_json", str(tmp_path / "s2.json")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    out = r.stdout
    # random weights: harness must RUN every gate and fail overall
    assert r.returncode == 1, (r.returncode, out, r.stderr[-2000:])
    for gate in ("z_p norms", "z_t norms", "dot diag", "homology[0,3]",
                 "homology[1,4]", "norm_z_t", "norm_z_p", "norm_z_c",
                 "mse_zc_zp", "mse_zt_zp", "mmd_zc_zp", "mmd_zp_zt"):
        assert f"] {gate}:" in out, (gate, out)
    assert "OVERALL: FAIL" in out, out
    # gates printed real numbers, not NaNs
    assert "nan" not in out.lower(), out


def test_parity_check_refuses_without_weights():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_check.py")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2, (r.returncode, r.stdout, r.stderr[-1000:])
    assert "no weights given" in r.stdout


def _build_tiny_stage3_ckpt(tmp_path):
    import torch
    import torch_golden

    torch.manual_seed(1)
    tm = torch_golden.GoldenDiffTransformer(
        num_classes=29, dim=32, depth=2, n_blocks=1, max_seq_len=64,
        num_timesteps=64, heads=4, n_local_attn_heads=2,
        local_attn_window_size=16, cond_dim=16,
    )
    torch.save({f"transformer.{k}": v for k, v in tm.state_dict().items()},
               tmp_path / "s3.bin")
    (tmp_path / "s3.json").write_text(json.dumps({
        "diffusion_steps": 64, "image_size": 8, "num_classes": 29,
        "text_emb_dim": 16, "transformer_dim": 32, "transformer_heads": 4,
        "transformer_depth": 2, "transformer_blocks": 1,
        "transformer_local_heads": 2, "transformer_local_size": 16,
    }))
    return tm


def _parity_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


def test_parity_check_stage3_gate_oracle_mode(tmp_path):
    """Gate 3 (bit-faithful temp-0 sequences): with the SAME checkpoint
    in the torch oracle and the JAX engine, the gate must PASS — proving
    converter, engine, permutation injection, and the oracle loop agree
    end to end."""
    _build_tiny_stage3_ckpt(tmp_path)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_check.py"),
         "--proteoscribe", str(tmp_path / "s3.bin"),
         "--stage3_json", str(tmp_path / "s3.json")],
        env=_parity_env(), capture_output=True, text=True, timeout=900,
    )
    out = r.stdout
    assert "stage3 temp-0 sequences" in out, (out, r.stderr[-2000:])
    assert "[PASS] stage3" in out, (out, r.stderr[-2000:])
    assert r.returncode == 0, (r.returncode, out, r.stderr[-2000:])


def test_parity_check_stage3_gate_trajectory_mode(tmp_path):
    """--reference_trajectory replay: a captured (path, z_c, expected_ids)
    file PASSes when the ids match and FAILs (exit 1) when one id is
    corrupted — the file mode is what a real reference GPU run will feed."""
    import torch_golden

    tm = _build_tiny_stage3_ckpt(tmp_path)
    rng = np.random.default_rng(3)
    paths = np.stack([rng.permutation(64) for _ in range(2)]).astype(np.int32)
    z_c = rng.standard_normal((2, 16)).astype(np.float32)
    expected = torch_golden.golden_temp0_denoise(tm, paths, z_c)

    np.savez(tmp_path / "traj.npz", path=paths, z_c=z_c,
             expected_ids=expected)
    cmd = [sys.executable, str(REPO / "tools" / "parity_check.py"),
           "--proteoscribe", str(tmp_path / "s3.bin"),
           "--stage3_json", str(tmp_path / "s3.json"),
           "--reference_trajectory", str(tmp_path / "traj.npz")]
    r = subprocess.run(cmd, env=_parity_env(), capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0 and "[PASS] stage3" in r.stdout, (
        r.returncode, r.stdout, r.stderr[-2000:])

    bad = expected.copy()
    bad[0, 0] = (bad[0, 0] + 1) % 29
    np.savez(tmp_path / "traj.npz", path=paths, z_c=z_c, expected_ids=bad)
    r = subprocess.run(cmd, env=_parity_env(), capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 1 and "[FAIL] stage3" in r.stdout, (
        r.returncode, r.stdout, r.stderr[-2000:])
