"""Orbax checkpointing, metric logging, profiling utils."""

import numpy as np
import jax
import jax.numpy as jnp

from biom3_tpu.io.orbax_io import CheckpointManager
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.logging import MetricLogger
from biom3_tpu.utils.profiling import StepTimer, host_memory_mb


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = make_optimizer("AdamW", 1e-3)
    state = TrainState.create(params, tx, with_ema=True)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, wait=True)

    # perturb then restore
    template = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(params["w"])
    )
    assert mgr.latest_step() == 0
    mgr.close()


def test_checkpoint_resume_latest(tmp_path):
    params = {"w": jnp.ones(4)}
    tx = make_optimizer("Adam", 1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (0, 5, 10):
        st = state.replace(step=jnp.asarray(step, jnp.int32))
        mgr.save(step, st, wait=True)
    restored = mgr.restore(jax.tree.map(jnp.zeros_like, state))
    assert int(restored.step) == 10
    mgr.close()


def test_metric_logger_csv(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log(0, {"loss": 1.5, "acc": 0.2})
    logger.log(1, {"loss": 1.2, "acc": 0.5})
    logger.close()
    content = (tmp_path / "metrics.csv").read_text().splitlines()
    assert content[0].startswith("step,loss,acc")
    assert len(content) == 3


def test_metric_logger_header_growth_and_appends(tmp_path):
    """New metric names (e.g. val_* rows) grow the header; earlier rows get
    blanks in the new columns; logging stays append-only (VERDICT r1 #7)."""
    import time

    logger = MetricLogger(str(tmp_path))
    logger.log(0, {"loss": 1.5})
    logger.log(1, {"loss": 1.2, "val_loss": 0.9})  # header grows once
    t0 = time.perf_counter()
    for step in range(2, 5002):
        logger.log(step, {"loss": 1.0 / step, "val_loss": 0.5})
    elapsed = time.perf_counter() - t0
    logger.close()
    lines = (tmp_path / "metrics.csv").read_text().splitlines()
    assert lines[0] == "step,loss,val_loss"
    assert len(lines) == 5003
    assert lines[1].split(",") == ["0", "1.5", ""]  # blank in grown column
    # O(1) per call: 5k appends finish fast (the old O(n^2) rewrite took
    # minutes at this scale); generous bound for slow CI hosts
    assert elapsed < 5.0


def test_step_timer_and_memory():
    timer = StepTimer(warmup=1)
    for _ in range(3):
        with timer:
            pass
    assert len(timer.times) == 2
    assert host_memory_mb() > 0


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax must save/restore a mesh-sharded state (the FSDP layout)."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from biom3_tpu.parallel.mesh import MeshConfig, make_mesh
    from biom3_tpu.parallel.sharding import shard_params

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    params = {"w": jnp.arange(64.0).reshape(8, 8), "b": jnp.ones(8)}
    sharded = shard_params(params, mesh)
    tx = make_optimizer("Adam", 1e-3)
    state = jax.jit(lambda p: TrainState.create(p, tx))(sharded)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, wait=True)
    restored = mgr.restore(jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(params["w"])
    )
    mgr.close()
