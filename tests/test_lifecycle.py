"""Full lifecycle integration: train → checkpoint → export → serve.

Covers the seam the reference exercises manually (train with Lightning,
distribute a .bin, sample with the CLI): here train a tiny ProteoScribe,
export its params to the reference's torch checkpoint format, reload through
the converter, and generate sequences with the inference engine.
"""

import numpy as np
import jax
import jax.numpy as jnp

from biom3_tpu.config import Config, ProteoScribeConfig
from biom3_tpu.io.convert import proteoscribe_params_from_torch
from biom3_tpu.io.export import proteoscribe_params_to_torch
from biom3_tpu.io.torch_load import load_torch_file, save_torch_file
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.stage3_task import make_stage3_train_step
from biom3_tpu.training.state import TrainState

TINY = ProteoScribeConfig(
    num_classes=29, dim=32, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=16, max_seq_len=64, num_timesteps=64, cond_dim=16,
)


def test_train_export_serve_roundtrip(tmp_path, rng):
    # --- train a few steps -------------------------------------------------
    model = ProteoScribe(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
    )
    tx = make_optimizer("AdamW", 1e-3)
    state = TrainState.create(params, tx, with_ema=True)
    step = jax.jit(make_stage3_train_step(model.apply, tx))
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 29, (8, 64)), jnp.int32),
        "z_c": jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
    }
    for i in range(3):
        state, aux = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(aux["loss"]))

    # --- export EMA params to the reference checkpoint format --------------
    ema = jax.tree.map(np.asarray, {"params": state.ema_params["params"]})
    sd = proteoscribe_params_to_torch(ema, TINY)
    ckpt_path = tmp_path / "trained.bin"
    save_torch_file(sd, str(ckpt_path))

    # --- serve through the inference engine (converter path) ---------------
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine

    stage_cfg = Config({
        "num_replicas": 2, "batch_size_sample": 2, "diffusion_steps": 64,
        "image_size": 8, "num_classes": 29, "text_emb_dim": 16,
        "transformer_dim": 32, "transformer_heads": 4, "transformer_depth": 2,
        "transformer_blocks": 1, "transformer_local_heads": 2,
        "transformer_local_size": 16, "seed": 0,
    })
    engine = ProteoScribeEngine(stage_cfg, str(ckpt_path), chunk_steps=32)
    out = engine.generate_sequences(
        rng.standard_normal((1, 16)).astype(np.float32), seed=1
    )
    assert set(out) == {"replica_0", "replica_1"}
    assert all(isinstance(s, str) for seqs in out.values() for s in seqs)

    # exported weights reload losslessly
    back = proteoscribe_params_from_torch(load_torch_file(str(ckpt_path)), TINY)
    for (ka, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(ema), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, err_msg=str(ka)
        )
