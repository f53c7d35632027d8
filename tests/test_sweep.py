"""Mesh-sharded generation sweep on the virtual 8-device CPU platform."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.parallel.mesh import MeshConfig, make_mesh
from biom3_tpu.pipeline.sweep import SweepRunner

TINY = ProteoScribeConfig(
    num_classes=29, dim=32, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=16, max_seq_len=64, num_timesteps=64, cond_dim=16,
)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sweep_runner_sharded():
    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    model = ProteoScribe(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
    )
    runner = SweepRunner(model.apply, params, TINY.num_timesteps, mesh,
                         chunk_steps=32)
    prompts = np.random.default_rng(0).standard_normal((5, 16)).astype(np.float32)
    seqs = runner.run(prompts, num_replicas=3, device_batch=16)
    assert len(seqs) == 5
    assert all(len(r) == 3 for r in seqs)
    assert all(isinstance(s, str) for r in seqs for s in r)
    # stochastic replicas of one prompt should not be all identical
    flat = [s for r in seqs for s in r]
    assert len(set(flat)) > 1


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sweep_runner_uneven_batch_padding():
    """Total rows not divisible by shard count must still work (padding)."""
    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    model = ProteoScribe(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
    )
    runner = SweepRunner(model.apply, params, TINY.num_timesteps, mesh,
                         chunk_steps=32)
    prompts = np.zeros((3, 16), np.float32)
    seqs = runner.run(prompts, num_replicas=1, device_batch=16)
    assert len(seqs) == 3 and all(len(r) == 1 for r in seqs)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sweep_runner_sharded_stack_kernel():
    """Multi-chip serving with the whole-stack kernel: shard_map over the
    (dp, fsdp) batch axes, one fused kernel per device shard (interpret
    mode on the CPU mesh).  Temp-0 output must match the single-device
    Flax graph run."""
    from biom3_tpu.models.fused_forward import make_sharded_stack_apply

    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    model = ProteoScribe(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
    )
    apply_fn = make_sharded_stack_apply(
        TINY, mesh, dtype=jnp.float32, resident=True, interpret=True,
    )
    runner = SweepRunner(
        model.apply, params, TINY.num_timesteps, mesh,
        chunk_steps=32, temperature=0.0,
    )
    runner_stack = SweepRunner(
        apply_fn, params, TINY.num_timesteps, mesh,
        chunk_steps=32, temperature=0.0, apply_takes_positions=True,
    )
    prompts = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32)
    want = runner.run(prompts, num_replicas=2, device_batch=8)
    got = runner_stack.run(prompts, num_replicas=2, device_batch=8)
    assert got == want


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_stage1_sweep_runner_sharded():
    """Mesh-sharded bulk embedding through the fused tower kernels
    (interpret mode on the CPU mesh): embeddings must track the engine's
    Flax forward to the serving drift gate (tanh-GELU path, >=0.999)."""
    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.sweep import Stage1SweepRunner

    cfg = Config({
        "protein_encoder_embedding": 16, "text_encoder_embedding": 16,
        "esm_num_layers": 1, "esm_attention_heads": 2,
        "bert_num_layers": 1, "bert_num_heads": 2,
        "bert_intermediate_size": 32, "bert_vocab_size": 40,
        "bert_max_position_embeddings": 32,
        "proj_embedding_dim": 8, "temperature": 0.8, "dropout": 0.1,
        "text_max_length": 32,
    })
    engine = PenCLEngine(cfg, None, dtype=jnp.float32,
                         tower_impl="fused-stack", attn_impl="xla")
    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    runner = Stage1SweepRunner(engine, mesh, device_batch=16,
                               interpret=True)

    rng = np.random.default_rng(0)
    N = 11  # not a multiple of the 8-shard count — exercises padding
    x_t = rng.integers(4, 40, (N, 32)).astype(np.int32)
    x_p = rng.integers(4, 30, (N, 24)).astype(np.int32)
    zt, zp = runner.run(x_t, x_p)
    assert zt.shape == (N, 8) and zp.shape == (N, 8)

    ref = engine._forward(engine.params, jnp.asarray(x_t), jnp.asarray(x_p))
    for got, want in ((zt, np.asarray(ref["text_joint_latent"])),
                      (zp, np.asarray(ref["seq_joint_latent"]))):
        cos = (got * want).sum(-1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
        )
        assert cos.min() > 0.999, cos.min()


def test_embed_text_fused_matches_flax():
    """text_only serving path: PenCLEngine.embed_text on the fused BERT
    tower (interpret twin on CPU) tracks the Flax encode_text graph to
    the serving drift gate (r4 — the sweep's embed phase now rides the
    whole-tower kernel instead of the Flax graph)."""
    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.tokenizers.synthetic import write_synthetic_wordpiece
    import tempfile
    import pathlib

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="embed_text_fused_"))
    vocab_size = write_synthetic_wordpiece(tmp / "tok")
    cfg = Config({
        "protein_encoder_embedding": 16, "text_encoder_embedding": 16,
        "esm_num_layers": 1, "esm_attention_heads": 2,
        "bert_num_layers": 1, "bert_num_heads": 2,
        "bert_intermediate_size": 32, "bert_vocab_size": vocab_size,
        "bert_max_position_embeddings": 32,
        "proj_embedding_dim": 8, "temperature": 0.8, "dropout": 0.1,
        "text_max_length": 32, "text_model_path": str(tmp / "tok"),
    })
    fused = PenCLEngine(cfg, None, dtype=jnp.float32, text_only=True,
                        tower_impl="fused-stack", attn_impl="xla")
    assert fused._stack_arrays is not None
    assert "esm" not in fused._stack_arrays  # text_only: no protein tower
    flax = PenCLEngine(cfg, None, dtype=jnp.float32, text_only=True,
                       tower_impl="flax", attn_impl="xla")
    flax.params = fused.params  # identical weights
    captions = ["membrane transport protein", "zinc finger domain",
                "atp dependent kinase variant seven"]
    got = fused.embed_text(captions, batch_size=2)
    want = flax.embed_text(captions, batch_size=2)
    assert got.shape == want.shape == (3, 8)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
