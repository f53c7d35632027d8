"""Config system tests: the three reference JSONs must load verbatim."""

import pytest

from biom3_tpu.config import (
    Config,
    FacilitatorConfig,
    ProteoScribeConfig,
    PenCLConfig,
    load_json_config,
)

REF = "/root/reference"


def test_reference_stage1_json():
    cfg = load_json_config(f"{REF}/stage1_config.json")
    assert cfg.temperature == 0.8
    # string-typed number quirk (stage1_config.json:14)
    assert cfg.weight_decay == "5e-7"
    assert cfg.float("weight_decay") == pytest.approx(5e-7)
    # "None" sentinel quirk
    assert cfg.str_or_none("data_path") is None
    pencl = PenCLConfig.from_stage_config(cfg)
    assert pencl.proj_dim == 512
    assert pencl.protein_embedding == 1280
    assert pencl.text_embedding == 768
    assert pencl.rep_layer == 33


def test_reference_stage2_json():
    cfg = load_json_config(f"{REF}/stage2_config.json")
    fac = FacilitatorConfig.from_stage_config(cfg)
    assert (fac.in_dim, fac.hid_dim, fac.out_dim) == (512, 1024, 512)
    assert fac.dropout == 0.0
    assert cfg.loss_type == "MMD"


def test_reference_stage3_json():
    cfg = load_json_config(f"{REF}/stage3_config.json")
    ps = ProteoScribeConfig.from_stage_config(cfg)
    assert ps.num_classes == 29
    assert ps.dim == 512
    assert ps.depth == 16
    assert ps.heads == 16
    assert ps.local_heads == 8
    assert ps.local_window == 128
    assert ps.max_seq_len == 1024
    assert ps.global_heads == 8
    assert ps.head_dim == 32


def test_config_mutation_and_nesting():
    cfg = Config({"a": {"b": 2}})
    cfg.device = "tpu"
    assert cfg.device == "tpu"
    assert cfg.a.b == 2
    assert "a" in cfg
    assert cfg.to_dict() == {"a": {"b": 2}, "device": "tpu"}


def test_missing_key_raises():
    with pytest.raises(AttributeError):
        Config({}).nope
