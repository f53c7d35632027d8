"""int8 MXU feasibility probe: is int8xint8->int32 GEMM ~2x bf16 here?

The v5e datasheet lists 394 TOPS int8 vs 197 TFLOPS bf16.  If XLA maps
jnp.int8 dots onto that path, quantized FF weights in the fused tower
kernels (BACKLOG "int8 FF weights" lever) could buy up to ~1.5x on the
FF-dominated ESM2 tower.  Chain protocol as exp_gemm_probe (two-length
difference; dispatch overhead cancels); the int8 chain requantizes the
int32 accumulator back to int8 between iterations (shift + clip — the
same VPU work a real in-kernel dynamic-quant FF would do).

Run: python tools/exp_int8_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def best(f, x, runs=3):
    b = float("inf")
    np.asarray(f(x))  # compile
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(f(x))
        b = min(b, time.perf_counter() - t0)
    return b


def rate_bf16(M, K, N, short=64, long=256):
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

    t_s, t_l = best(chain(short), x), best(chain(long), x)
    flops = 2 * 2 * M * K * N
    return (long - short) * flops / max(t_l - t_s, 1e-9)


def rate_int8(M, K, N, short=64, long=256):
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    def dot8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def chain(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                h = dot8(c, w1)
                h = jnp.clip(h >> 8, -127, 127).astype(jnp.int8)
                o = dot8(h, w2)
                o = jnp.clip(o >> 8, -127, 127).astype(jnp.int8)
                return o, ()
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out[0, :8]
        return run

    t_s, t_l = best(chain(short), x), best(chain(long), x)
    flops = 2 * 2 * M * K * N
    return (long - short) * flops / max(t_l - t_s, 1e-9)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for M, K, N in [
        (8192, 2048, 8192),
        (16384, 1280, 5120),  # ESM2 FF shape at B=16
    ]:
        rb = rate_bf16(M, K, N)
        ri = rate_int8(M, K, N)
        print(f"  {M:6d}x{K:5d}x{N:5d}: bf16 {rb/1e12:7.1f} TF/s   "
              f"int8 {ri/1e12:7.1f} TOP/s   ratio {ri/rb:.2f}")


if __name__ == "__main__":
    main()
