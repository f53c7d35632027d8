"""Benchmark harness: ProteoScribe end-to-end sampling throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is the reference's throughput-critical path (SURVEY.md
§3.3): full 1024-step conditional denoising of batch-of-32 sequences —
what ``run_ProteoScribe_sample.py`` does per prompt.  Here the whole loop is
one compiled ``lax.scan`` on device.

The reference publishes no throughput numbers (BASELINE.md).  ``vs_baseline``
is therefore measured against an *estimated* A100 eager-PyTorch rate for the
same workload, documented inline: ~103 GFLOP/seq/step × 1024 steps at ~20%
fp16 utilization of 312 TFLOPS with per-step host sync ≈ 0.12 seqs/sec.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EAGER_SEQS_PER_SEC_EST = 0.12


def main() -> None:
    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
    from biom3_tpu.models.proteoscribe import ProteoScribe

    cfg = ProteoScribeConfig()  # full reference config
    model = ProteoScribe(cfg, dtype=jnp.bfloat16)
    B = 32  # reference batch_size_sample (stage3_config.json:16)

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.cond_dim)),
    )
    # chunked dispatch: bounds single-execution wall clock (the tunnel
    # runtime kills executions running much longer than ~1 minute)
    sampler = make_sampler(model.apply, cfg.num_timesteps, chunk_steps=128)
    z_c = jnp.zeros((B, cfg.cond_dim), jnp.float32)
    path = sample_permutations(jax.random.key(1), B, cfg.max_seq_len)

    # compile + warmup; time with a host fetch — block_until_ready is
    # unreliable through the device tunnel
    t0 = time.perf_counter()
    np.asarray(sampler(params, z_c, path, jax.random.key(2)))
    compile_s = time.perf_counter() - t0

    runs = []
    for i in range(2):
        t0 = time.perf_counter()
        np.asarray(sampler(params, z_c, path, jax.random.key(3 + i)))
        runs.append(time.perf_counter() - t0)
    best = min(runs)
    seqs_per_sec = B / best

    print(
        json.dumps(
            {
                "metric": "proteoscribe_seqs_per_sec_per_chip",
                "value": round(seqs_per_sec, 3),
                "unit": "seqs/sec (1024-step denoise, B=32, bf16)",
                "vs_baseline": round(seqs_per_sec / A100_EAGER_SEQS_PER_SEC_EST, 2),
                "detail": {
                    "batch": B,
                    "steps": cfg.num_timesteps,
                    "best_run_s": round(best, 3),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
