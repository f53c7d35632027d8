"""One process of a real multi-process ``jax.distributed`` cluster (CPU).

Launched by ``tests/test_multihost.py`` as N processes × 4 local CPU
devices each.  Exercises the multi-host surface the sandbox's single chip
cannot: ``initialize_distributed`` with an explicit coordinator,
``make_hybrid_mesh`` (dp across processes = DCN, fsdp/tp inside = ICI),
cross-process parameter/batch placement (``put_global``), and one full
sharded Stage-3 train step plus one Stage-1 global-batch contrastive step
— the two paths the reference distributes (Stage3_source/PL_wrapper.py:
157-209 ZeRO, Stage1_source/PL_wrapper.py:989-1016 all_gather+sync_grads).

Each process prints its replicated losses; the parent asserts every
process saw bit-identical values (proof the cross-process collectives ran
coherently, not per-process).
"""

from __future__ import annotations

import argparse
import os

# Force the CPU backend with 4 local devices BEFORE jax import: this worker
# must never grab the TPU tunnel, and the device count must be set at
# backend-init time.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    from biom3_tpu.parallel.distributed import (
        initialize_distributed, make_hybrid_mesh,
    )
    from biom3_tpu.parallel.mesh import MeshConfig

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * args.num_processes

    # dp spans processes (the DCN axis), fsdp/tp stay inside one process
    # (the ICI axes) — the §2.3 hybrid layout.
    mesh = make_hybrid_mesh(
        MeshConfig(dp=args.num_processes, fsdp=2, tp=2)
    )
    # every fsdp/tp row must live inside one process
    for dp_row in mesh.devices:
        procs = {d.process_index for d in dp_row.flat}
        assert len(procs) == 1, procs

    # ---- Stage-3: full sharded train step (same tiny config as the driver
    # dryrun so the persistent compile cache is shared) ----
    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.models.proteoscribe import ProteoScribe
    from biom3_tpu.training.optim import coswarmup_schedule, make_optimizer
    from biom3_tpu.training.stage3_task import make_sharded_stage3_train_step

    cfg = ProteoScribeConfig(
        num_classes=29, dim=64, depth=2, n_blocks=1, heads=4, local_heads=2,
        local_window=32, max_seq_len=128, num_timesteps=128, cond_dim=32,
    )
    model = ProteoScribe(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.cond_dim)),
    )
    tx = make_optimizer(
        "AdamW", coswarmup_schedule(1e-4, 10, 100), weight_decay=1e-6
    )
    step_fn, state = make_sharded_stage3_train_step(
        model.apply, tx, mesh, params, with_ema=True, accum_steps=2
    )
    B = 2 * args.num_processes * 2  # global batch over (dp, fsdp)
    batch = {
        "tokens": jnp.ones((B, cfg.max_seq_len), jnp.int32),
        "z_c": jnp.zeros((B, cfg.cond_dim), jnp.float32),
    }
    state, aux = step_fn(state, batch, jax.random.key(1))
    loss3 = float(aux["loss"])
    assert np.isfinite(loss3), loss3

    # ---- Stage-1: global-batch contrastive step (the comm-heavy path) ----
    from biom3_tpu.config import BertConfig, Config, ESM2Config, PenCLConfig
    from biom3_tpu.models.pencl import PenCL
    from biom3_tpu.training.sharded import make_sharded_train_step
    from biom3_tpu.training.stage1_task import (
        make_stage1_optimizer, make_stage1_train_step,
    )

    pcfg = PenCLConfig(
        esm=ESM2Config(num_layers=1, embed_dim=16, attention_heads=2,
                       vocab_size=33),
        bert=BertConfig(num_layers=1, hidden_size=16, num_heads=2,
                        intermediate_size=32, vocab_size=40,
                        max_position_embeddings=16),
        protein_embedding=16, text_embedding=16, proj_dim=8, temperature=0.8,
    )
    pencl = PenCL(pcfg)
    pparams = pencl.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    ptx = make_stage1_optimizer(Config({
        "protein_encoder_lr": 1e-4, "text_encoder_lr": 1e-4,
        "head_lr": 1e-4, "weight_decay": "5e-7",
    }))
    s1_step = make_stage1_train_step(
        pencl.apply, ptx, temperature=0.8, dataset_type="pfam",
        text_mask_id=5, protein_mask_id=32, with_metrics=False,
    )
    run1, s1_state = make_sharded_train_step(
        s1_step, ptx, mesh, pparams, has_rng=False
    )
    rng = np.random.default_rng(0)  # same seed on every process
    Bg = 2 * args.num_processes * 2
    s1_batch = {}
    for name, (vocab, length) in (("text", (40, 12)), ("protein", (30, 14))):
        for prefix in ("", "pfam_"):
            toks = rng.integers(4, vocab, (Bg, length)).astype(np.int32)
            masked = toks.copy()
            masked[:, 2] = 32 if name == "protein" else 5
            s1_batch[f"{prefix}{name}_tokens"] = jnp.asarray(toks)
            s1_batch[f"{prefix}{name}_tokens_masked"] = jnp.asarray(masked)
    s1_state, s1_aux = run1(s1_state, s1_batch)
    loss1 = float(s1_aux["loss"])
    assert np.isfinite(loss1), loss1

    print(
        f"MULTIHOST process={args.process_id}/{args.num_processes} "
        f"devices={jax.device_count()} stage3_loss={loss3:.9f} "
        f"stage1_loss={loss1:.9f}",
        flush=True,
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
