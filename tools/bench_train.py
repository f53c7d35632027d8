"""On-chip Stage-3 training-step throughput A/B (scan-layers triage).

Times the full OA-ARDM train step (fwd + bwd + AdamW + EMA) for the model
variants that trade compile size against runtime (BACKLOG: plain
``scan_layers`` ran ~50% slower than the unrolled graph because the scan
boundary blocks inter-layer fusion; ``scan_unroll`` buys fusion back):

  * unrolled           — scan_layers=False (fastest run, biggest HLO)
  * unrolled+remat     — per-layer rematerialization
  * scan u{1,2,4}      — nn.scan over depth with unroll factor
  * scan u2+remat      — the training-memory configuration

Each probe is a ``lax.scan`` of ``--steps`` train steps dispatched as one
execution (tunnel protocol: never time single dispatches), timed by host
fetch, best of ``--runs``.  Prints ms/step, tokens/s, and train MFU
(3x forward FLOPs / measured peak; pass --peak from bench.py's calibrated
GEMM number).

Run: python tools/bench_train.py [--batch 32] [--steps 8] [--variants ...]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.stage3_task import make_stage3_train_step
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.flops import proteoscribe_forward_flops

VARIANTS = {
    "layer_block": dict(scan_layers=False, remat=False,
                        attn_impl="layer-block"),
    "block": dict(scan_layers=False, remat=False, attn_impl="block"),
    "block_remat": dict(scan_layers=False, remat=True, attn_impl="block"),
    "unrolled": dict(scan_layers=False, remat=False),
    "unrolled_remat": dict(scan_layers=False, remat=True),
    "scan_u1": dict(scan_layers=True, scan_unroll=1, remat=False),
    "scan_u2": dict(scan_layers=True, scan_unroll=2, remat=False),
    "scan_u4": dict(scan_layers=True, scan_unroll=4, remat=False),
    "scan_u2_remat": dict(scan_layers=True, scan_unroll=2, remat=True),
}


def bench_variant(name, kwargs, cfg, batch, steps, runs, peak_tf):
    model = ProteoScribe(cfg, dtype=jnp.bfloat16, **kwargs)
    tx = optax.adamw(1e-4)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(
            1, cfg.num_classes, (batch, cfg.max_seq_len)
        ).astype(np.int32)
    )
    z_c = jnp.zeros((batch, cfg.cond_dim), jnp.float32)
    variables = model.init(
        jax.random.key(0), tokens[:1], jnp.zeros((1,), jnp.int32), z_c[:1]
    )
    state = TrainState.create(variables, tx)  # apply takes the variables dict
    step = make_stage3_train_step(model.apply, tx)

    @jax.jit
    def run_n(state, key):
        def body(carry, k):
            st, _ = carry
            st, aux = step(st, {"tokens": tokens, "z_c": z_c}, k)
            return (st, aux["loss"]), ()
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, steps)
        )
        return loss  # tiny host fetch

    try:
        t0 = time.perf_counter()
        np.asarray(run_n(state, jax.random.key(1)))
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — OOM / HLO-too-big etc.
        print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    best = float("inf")
    for i in range(runs):
        t0 = time.perf_counter()
        np.asarray(run_n(state, jax.random.key(2 + i)))
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    tok_s = batch * cfg.max_seq_len / (best / steps)
    fwd_tf = proteoscribe_forward_flops(cfg, batch) / 1e12
    mfu = 3 * fwd_tf / (best / steps) / peak_tf * 100 if peak_tf else 0.0
    print(f"{name:16s}: {ms:8.1f} ms/step  {tok_s/1e3:8.1f} ktok/s  "
          f"MFU {mfu:4.1f}%  (compile {compile_s:.0f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--peak", type=float, default=190.0,
                    help="measured bf16 GEMM TF/s (bench.py calibration)")
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--toy", action="store_true",
                    help="tiny config for CPU smoke runs")
    args = ap.parse_args()

    cfg = ProteoScribeConfig()
    if args.toy:
        cfg = ProteoScribeConfig(
            dim=64, depth=4, heads=4, local_heads=2, local_window=32,
            max_seq_len=128, num_timesteps=128, cond_dim=48,
        )
        args.batch = min(args.batch, 4)
    print(f"device: {jax.devices()[0]}  B={args.batch} L={cfg.max_seq_len} "
          f"steps/dispatch={args.steps}")
    for name in args.variants:
        bench_variant(name, VARIANTS[name], cfg, args.batch, args.steps,
                      args.runs, args.peak)


if __name__ == "__main__":
    main()
