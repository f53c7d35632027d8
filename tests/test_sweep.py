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
