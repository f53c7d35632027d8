"""Benchmark harness: ProteoScribe end-to-end sampling throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is the reference's throughput-critical path (SURVEY.md
§3.3) at reference semantics: full 1024-step conditional denoising of a
batch of 32 sequences, one position per step — what
``run_ProteoScribe_sample.py`` does per prompt, but compiled as an on-device
``lax.scan``.  ``detail.fast_mode`` additionally reports blocked any-order
decoding (8 positions per forward), the framework's high-throughput serving
mode.

The reference publishes no throughput numbers (BASELINE.md).  ``vs_baseline``
is measured against an *estimated* A100 eager-PyTorch rate for the same
workload, documented inline: ~103 GFLOP/seq/step × 1024 steps at ~20% fp16
utilization of 312 TFLOPS plus per-step host sync ≈ 0.12 seqs/sec.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EAGER_SEQS_PER_SEC_EST = 0.12


def _measure(sampler, params, z_c, path, runs=2):
    t0 = time.perf_counter()
    np.asarray(sampler(params, z_c, path, jax.random.key(2)))  # compile+warm
    warm_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(runs):
        t0 = time.perf_counter()
        np.asarray(sampler(params, z_c, path, jax.random.key(3 + i)))
        best = min(best, time.perf_counter() - t0)
    return best, warm_s - best  # (steady-state, approx compile time)


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
    z_c = jnp.zeros((B, cfg.cond_dim), jnp.float32)
    path = sample_permutations(jax.random.key(1), B, cfg.max_seq_len)

    # parity mode: 1 position/step — chunked dispatch bounds single-execution
    # wall clock (the tunnel runtime kills ~1-minute executions); timing via
    # host fetch (block_until_ready is unreliable through the tunnel)
    parity = make_sampler(model.apply, cfg.num_timesteps, chunk_steps=128)
    best_parity, compile_s = _measure(parity, params, z_c, path)

    # fast mode: blocked decoding, 8 positions per forward
    fast = make_sampler(
        model.apply, cfg.num_timesteps, chunk_steps=128, positions_per_step=8
    )
    best_fast, _ = _measure(fast, params, z_c, path)

    seqs_per_sec = B / best_parity
    print(
        json.dumps(
            {
                "metric": "proteoscribe_seqs_per_sec_per_chip",
                "value": round(seqs_per_sec, 3),
                "unit": "seqs/sec (1024-step denoise, B=32, bf16, 1 pos/step)",
                "vs_baseline": round(seqs_per_sec / A100_EAGER_SEQS_PER_SEC_EST, 2),
                "detail": {
                    "batch": B,
                    "steps": cfg.num_timesteps,
                    "best_run_s": round(best_parity, 3),
                    "compile_s": round(compile_s, 1),
                    "fast_mode_seqs_per_sec": round(B / best_fast, 3),
                    "fast_mode": "blocked any-order decoding, 8 pos/forward",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
