"""CLI-surface tests: drive the stage CLIs as subprocesses with synthetic
checkpoints (the published weights aren't available in this sandbox; the
torch-golden models produce key-compatible state dicts)."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent


def run_cli(module: str, *args: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, env=env, timeout=600,
    )


@pytest.fixture
def tmp_facilitator(tmp_path):
    import torch
    import torch.nn as nn
    from torch.nn.utils.weight_norm import weight_norm

    torch.manual_seed(0)
    model = nn.Sequential(
        weight_norm(nn.Linear(512, 1024), dim=None), nn.GELU(), nn.Dropout(0.0),
        weight_norm(nn.Linear(1024, 512), dim=None),
    )
    sd = {
        f"main.{k}": v for k, v in model.state_dict().items()
        if not k.endswith(".weight")
    }
    ckpt = tmp_path / "facilitator.bin"
    torch.save(sd, ckpt)

    rng = np.random.default_rng(0)
    data = {
        "sequence": ["AAA", "CCC"],
        "text_prompts": ["a", "b"],
        "z_t": torch.from_numpy(rng.standard_normal((2, 512)).astype(np.float32)),
        "z_p": torch.from_numpy(rng.standard_normal((2, 512)).astype(np.float32)),
    }
    inp = tmp_path / "pencl_out.pt"
    torch.save(data, inp)
    return ckpt, inp, model, data


def test_facilitator_cli(tmp_path, tmp_facilitator):
    import torch

    ckpt, inp, model, data = tmp_facilitator
    out_path = tmp_path / "fac_out.pt"
    r = run_cli(
        "biom3_tpu.cli.run_facilitator_sample",
        "--json_path", "/root/reference/stage2_config.json",
        "--model_path", str(ckpt),
        "--input_data_path", str(inp),
        "--output_data_path", str(out_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "=== Facilitator Model Output ===" in r.stdout
    assert "MSE between Facilitated Embeddings" in r.stdout
    saved = torch.load(out_path, weights_only=False)
    assert "z_c" in saved and tuple(saved["z_c"].shape) == (2, 512)
    # parity with the torch model
    with torch.no_grad():
        ref = model(data["z_t"]).numpy()
    np.testing.assert_allclose(np.asarray(saved["z_c"]), ref, atol=2e-5)


TINY_STAGE3 = {
    "num_replicas": 3, "batch_size_sample": 2, "diffusion_steps": 64,
    "seed": 42, "image_size": 8, "num_classes": 29, "task": "proteins",
    "text_emb_dim": 16, "transformer_dim": 32, "transformer_heads": 4,
    "transformer_depth": 2, "transformer_blocks": 1,
    "transformer_local_heads": 2, "transformer_local_size": 16,
    "facilitator": "MMD", "context_window_size": 64,
}


def test_proteoscribe_cli(tmp_path):
    import torch
    import torch_golden

    cfg_path = tmp_path / "stage3_tiny.json"
    cfg_path.write_text(json.dumps(TINY_STAGE3))

    torch.manual_seed(0)
    tm = torch_golden.GoldenDiffTransformer(
        num_classes=29, dim=32, depth=2, n_blocks=1, max_seq_len=64,
        num_timesteps=64, heads=4, n_local_attn_heads=2,
        local_attn_window_size=16, cond_dim=16,
    )
    # wrap with the DiffTransformer prefix used by the published .bin
    sd = {f"transformer.{k}": v for k, v in tm.state_dict().items()}
    ckpt = tmp_path / "proteoscribe.bin"
    torch.save(sd, ckpt)

    rng = np.random.default_rng(1)
    inp = tmp_path / "fac_out.pt"
    torch.save(
        {"z_c": torch.from_numpy(rng.standard_normal((2, 16)).astype(np.float32))},
        inp,
    )
    out_path = tmp_path / "designs.pt"
    r = run_cli(
        "biom3_tpu.cli.run_proteoscribe_sample",
        "--json_path", str(cfg_path),
        "--model_path", str(ckpt),
        "--input_path", str(inp),
        "--output_path", str(out_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "design_sequence_dict=" in r.stdout
    saved = torch.load(out_path, weights_only=False)
    assert set(saved) == {"replica_0", "replica_1", "replica_2"}
    for seqs in saved.values():
        assert len(seqs) == 2  # one per prompt
        for s in seqs:
            assert isinstance(s, str)
            assert "<START>" not in s and "<PAD>" not in s


def test_proteoscribe_cli_temp0_deterministic(tmp_path):
    import torch
    import torch_golden

    cfg_path = tmp_path / "stage3_tiny.json"
    cfg_path.write_text(json.dumps(TINY_STAGE3))
    torch.manual_seed(0)
    tm = torch_golden.GoldenDiffTransformer(
        num_classes=29, dim=32, depth=2, n_blocks=1, max_seq_len=64,
        num_timesteps=64, heads=4, n_local_attn_heads=2,
        local_attn_window_size=16, cond_dim=16,
    )
    torch.save(
        {f"transformer.{k}": v for k, v in tm.state_dict().items()},
        tmp_path / "m.bin",
    )
    torch.save({"z_c": torch.zeros(1, 16)}, tmp_path / "in.pt")

    outs = []
    for i, out_name in enumerate(["a.pt", "b.pt"]):
        r = run_cli(
            "biom3_tpu.cli.run_proteoscribe_sample",
            "--json_path", str(cfg_path), "--model_path", str(tmp_path / "m.bin"),
            "--input_path", str(tmp_path / "in.pt"),
            "--output_path", str(tmp_path / out_name),
            "--temperature", "0", "--seed", str(100 + i),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(torch.load(tmp_path / out_name, weights_only=False))
    # temp-0 sampling depends only on the permutation; replicas within one
    # run use different permutations, but the same seed policy means run-level
    # determinism is only guaranteed per (seed, replica).  Check outputs are
    # well-formed and the dict structure matches.
    assert set(outs[0]) == set(outs[1])
