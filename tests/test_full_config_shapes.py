"""Full-config shape smoke tests via jax.eval_shape (no weights, no FLOPs).

SURVEY.md §4's recommendation: every model must trace at its published
configuration — catching shape/config regressions without materializing
650M parameters.
"""

import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import (
    FacilitatorConfig,
    PenCLConfig,
    ProteoScribeConfig,
    load_json_config,
)
from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.models.proteoscribe import ProteoScribe

REF = "/root/reference"


@pytest.mark.slow  # 9 s; bench runs the real full-size PenCL on chip every
# round
def test_pencl_full_config_traces():
    cfg = PenCLConfig.from_stage_config(load_json_config(f"{REF}/stage1_config.json"))
    assert cfg.esm.num_layers == 33 and cfg.esm.embed_dim == 1280
    assert cfg.bert.num_layers == 12 and cfg.bert.hidden_size == 768
    model = PenCL(cfg)
    x_t = jax.ShapeDtypeStruct((2, 512), jnp.int32)
    x_p = jax.ShapeDtypeStruct((2, 1024), jnp.int32)

    variables = jax.eval_shape(
        lambda k, a, b: model.init(k, a, b, method=PenCL.init_all_params),
        jax.random.key(0), x_t, x_p,
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(variables)
    )
    # ESM2-650M + BERT-base + heads ≈ 760M parameters
    assert 700e6 < n_params < 850e6, n_params

    out = jax.eval_shape(model.apply, variables, x_t, x_p)
    assert out["text_joint_latent"].shape == (2, 512)
    assert out["seq_joint_latent"].shape == (2, 512)


def test_proteoscribe_full_config_traces():
    cfg = ProteoScribeConfig.from_stage_config(
        load_json_config(f"{REF}/stage3_config.json")
    )
    model = ProteoScribe(cfg)
    x = jax.ShapeDtypeStruct((32, 1024), jnp.int32)
    t = jax.ShapeDtypeStruct((32,), jnp.int32)
    z = jax.ShapeDtypeStruct((32, 512), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), x, t, z)
    n_params = sum(
        int(jnp.prod(jnp.asarray(p.shape))) for p in jax.tree.leaves(variables)
    )
    assert 80e6 < n_params < 95e6, n_params  # ~86M
    out = jax.eval_shape(model.apply, variables, x, t, z)
    assert out.shape == (32, 1024, 29)


def test_facilitator_full_config_traces():
    cfg = FacilitatorConfig.from_stage_config(
        load_json_config(f"{REF}/stage2_config.json")
    )
    model = Facilitator(cfg)
    z = jax.ShapeDtypeStruct((64, 512), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), z)
    out = jax.eval_shape(model.apply, variables, z)
    assert out.shape == (64, 512)
