"""GEMM-peak probe shape sweep on the real chip.

bench.py's MFU basis is max(label peak, GEMM probe, achieved rate); the
512->2048->512 probe has read as low as 190 TF/s in sessions where the
PenCL forward itself sustained 417 TF/s — the probe, not the chip, is the
limiter.  Sweep candidate chain shapes (two-length difference protocol,
dispatch overhead cancels) to pick one that reads at least what real
workloads achieve.

Run: python tools/exp_gemm_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def rate(M, K, N, short=64, long=256, runs=3):
    key = jax.random.key(0)
    w1 = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.02
    x = jax.random.normal(key, (M, K), jnp.bfloat16)

    def chain(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                return (c @ w1) @ w2, ()
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out[0, :8]
        return run

    def best(f):
        b = float("inf")
        np.asarray(f(x))  # compile
        for _ in range(runs):
            t0 = time.perf_counter()
            np.asarray(f(x))
            b = min(b, time.perf_counter() - t0)
        return b

    t_s, t_l = best(chain(short)), best(chain(long))
    flops = 2 * 2 * M * K * N
    if t_l <= t_s:
        return long * flops / t_l
    return (long - short) * flops / (t_l - t_s)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for M, K, N in [
        (32768, 512, 2048),   # current probe (Stage-3 FF shape)
        (8192, 2048, 8192),   # big square-ish
        (4096, 4096, 4096),   # square
        (16384, 1280, 5120),  # ESM2 FF shape at B=16 (the 417 TF/s workload)
        (8192, 8192, 8192),   # very big
    ]:
        r = rate(M, K, N)
        print(f"  {M:6d}x{K:5d}x{N:5d}: {r/1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()
