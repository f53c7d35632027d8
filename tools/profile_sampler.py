"""On-chip breakdown of the Stage-3 sampling step (serving perf triage).

The parity sampler runs ~26 ms/step at B=32 while the 16 fused layer
kernels alone were measured at ~0.8 ms each (~12.8 ms) — this script
attributes the remainder.  Each probe is a 128-iteration ``lax.scan``
dispatched as one execution (matching the sampler's ``chunk_steps=128``),
timed by host fetch of a tiny slice (CLAUDE.md tunnel protocol), best of
``--runs`` after a warmup.  Probes:

  * ``layers``      — 16x (fused_attn_half + fused_ff_half) only
  * ``attn_only``   — 16x fused_attn_half
  * ``ff_only``     — 16x fused_ff_half
  * ``forward``     — full fused apply (embedding + biases + layers), hidden out
  * ``step``        — the real sampler chunk (forward + gather + head + sample
                      + one-hot write + scan carry).  Default
                      ``--sampler-path stack`` times the SAME whole-stack
                      int8 executable as bench.py's headline metric
                      (~17.6 ms/step r4), so the two instruments agree;
                      ``--sampler-path fused`` times the per-layer kernel
                      path (~26.5 ms/step — the pre-r5 probe) for the
                      kernel attribution below.

Run:  python tools/profile_sampler.py [--steps 128] [--runs 2] [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, runs=2):
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    # the tunnel's remote_compile endpoint rejects very large HLO payloads
    # (HTTP 413) — run heavyweight probes in separate processes via --which
    ap.add_argument("--which", default="all",
                    choices=["all", "kernels", "forward", "step"])
    ap.add_argument("--sampler-path", default="stack",
                    choices=["stack", "fused"],
                    help="executable for the step probe: 'stack' = the "
                         "serving/bench whole-stack int8 kernel (the two "
                         "instruments then agree); 'fused' = the per-layer "
                         "fused kernels + separate head (r4's probe — "
                         "~26.5 vs 17.6 ms/step, attribution only)")
    args = ap.parse_args()

    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
    from biom3_tpu.models.fused_forward import (
        final_head,
        make_fused_apply,
    )
    from biom3_tpu.models.proteoscribe import ProteoScribe
    from biom3_tpu.ops.pallas.fused_layer_tpu import fused_attn_half, fused_ff_half

    cfg = ProteoScribeConfig()
    B, L, d = args.batch, cfg.max_seq_len, cfg.dim
    steps = args.steps
    model = ProteoScribe(cfg, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, L), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.cond_dim)),
    )
    p = variables["params"]
    z_c = jnp.zeros((B, cfg.cond_dim), jnp.float32)
    h0 = jax.random.normal(jax.random.key(1), (B, L, d), jnp.bfloat16) * 0.02
    bias = jnp.zeros((B, d), jnp.bfloat16)

    def layer_stack(h, *, attn=True, ff=True):
        for li in range(cfg.depth):
            lp = p[f"layer_0_{li}"]
            ap_ = lp["attn"]
            if attn:
                h = fused_attn_half(
                    h, bias,
                    lp["attn_norm"]["scale"], lp["attn_norm"]["bias"],
                    ap_["to_q_kernel"].astype(jnp.bfloat16),
                    ap_["to_k_kernel"].astype(jnp.bfloat16),
                    ap_["to_v_kernel"].astype(jnp.bfloat16),
                    ap_["to_out"]["kernel"].astype(jnp.bfloat16),
                    ap_["to_out"]["bias"],
                    local_heads=cfg.local_heads, heads=cfg.heads,
                    window=cfg.local_window,
                )
            if ff:
                h = fused_ff_half(
                    h,
                    lp["ff_norm"]["scale"], lp["ff_norm"]["bias"],
                    lp["ff_w1"]["kernel"].astype(jnp.bfloat16),
                    lp["ff_w1"]["bias"],
                    lp["ff_w2"]["kernel"].astype(jnp.bfloat16),
                    lp["ff_w2"]["bias"],
                )
        return h

    def scan_stack(**kw):
        @jax.jit
        def run(h):
            def body(c, _):
                nh = layer_stack(c, **kw)
                return nh, ()
            out, _ = jax.lax.scan(body, h, None, length=steps)
            return out[0, 0, :8]
        return run

    results = {}
    if args.which in ("all", "kernels"):
        for name, kw in [
            ("layers", dict(attn=True, ff=True)),
            ("attn_only", dict(attn=True, ff=False)),
            ("ff_only", dict(attn=False, ff=True)),
        ]:
            t = timed(scan_stack(**kw), h0, runs=args.runs)
            results[name] = t / steps
            print(f"{name:10s}: {t/steps*1e3:8.2f} ms/iter  ({t:.2f} s / {steps})")
    if args.which == "kernels":
        return

    fused = make_fused_apply(cfg, return_hidden=True)

    @jax.jit
    def forward_scan(x0):
        def body(c, i):
            h = fused(variables, c, jnp.full((B,), i % cfg.num_timesteps,
                                             jnp.int32), z_c)
            # feed back an int token grid so iterations stay sequential
            nx = (c + (h[:, :, 0] > 0).astype(jnp.int32)) % cfg.num_classes
            return nx, ()
        out, _ = jax.lax.scan(
            body, x0, jnp.arange(steps, dtype=jnp.int32))
        return out[0, :8]

    x0 = jnp.zeros((B, L), jnp.int32)
    if args.which in ("all", "forward"):
        t = timed(forward_scan, x0, runs=args.runs)
        results["forward"] = t / steps
        print(f"{'forward':10s}: {t/steps*1e3:8.2f} ms/iter  ({t:.2f} s / {steps})")
    if args.which == "forward":
        return

    # the step probe times the SAME executable bench.py's headline metric
    # times (whole-stack resident kernel, int8 FF/proj, dl stream, VPU
    # opts) — r4 left a 26.5 vs 17.6 ms/step discrepancy between the two
    # instruments because this probe still ran the per-layer fused-kernel
    # path with a separate head call; --sampler-path fused keeps that
    # older path measurable for layer-kernel attribution
    if args.sampler_path == "stack":
        from biom3_tpu.models.fused_forward import make_stack_apply

        stack = make_stack_apply(cfg, gelu="tanh", resident=True,
                                 ff_quant="int8", proj_quant="int8",
                                 stream="dl", softmax_opt=True,
                                 ln_onepass=True)
        sampler = make_sampler(stack, cfg.num_timesteps, chunk_steps=steps,
                               apply_takes_positions=True)
    else:
        head_fn = lambda v, h: final_head(
            cfg, v["params"] if "params" in v else v, h)
        sampler = make_sampler(fused, cfg.num_timesteps, chunk_steps=steps,
                               head_fn=head_fn)
    path = sample_permutations(jax.random.key(2), B, L)

    # one chunk of the real sampler = steps real steps
    inv = jnp.argsort(path, axis=-1)

    # reuse the sampler's internals via a bounded run: temporarily run only
    # the first chunk by calling the chunk function through sample() with
    # num_steps == steps is wrong semantics; instead time the full 1024-step
    # run and divide.
    t0 = time.perf_counter()
    np.asarray(sampler(variables, z_c, path, jax.random.key(3)))
    full_warm = time.perf_counter() - t0
    best_full = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        np.asarray(sampler(variables, z_c, path, jax.random.key(4)))
        best_full = min(best_full, time.perf_counter() - t0)
    results["step"] = best_full / cfg.num_timesteps
    print(f"{'step':10s}: {best_full/cfg.num_timesteps*1e3:8.2f} ms/iter  "
          f"({best_full:.2f} s / {cfg.num_timesteps}; warm+compile "
          f"{full_warm:.1f} s)")
    print(f"seqs/s parity: {B / best_full:.3f}")

    if args.which == "all" and args.sampler_path == "fused":
        # attribution only makes sense when 'step' ran the same per-layer
        # kernels the 'layers'/'forward' probes ran — the stack-path step
        # is a different (faster) executable
        print("\nattribution (ms/step):")
        print(f"  layers        {results['layers']*1e3:7.2f}")
        print(f"    attn        {results['attn_only']*1e3:7.2f}")
        print(f"    ff          {results['ff_only']*1e3:7.2f}")
        print(f"  embed+bias    {(results['forward']-results['layers'])*1e3:7.2f}")
        print(f"  sample+scan   {(results['step']-results['forward'])*1e3:7.2f}")


if __name__ == "__main__":
    main()
