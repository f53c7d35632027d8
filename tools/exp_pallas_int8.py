"""Mosaic int8 feasibility: int8 x int8 -> int32 dot inside a Pallas kernel.

Checks (a) that the kernel compiles/lowers on the real chip, (b) numerics
vs XLA int32 reference, (c) throughput vs a bf16 twin at the ESM2 FF tile
shape (1024, 1280) @ (1280, 5120) — the shape the fused tower kernel's
ff_body issues.

Run: python tools/exp_pallas_int8.py            (real chip)
     JAX_PLATFORMS=cpu python tools/exp_pallas_int8.py --interpret
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, xs_ref, d_ref, *, iters, kind):
    xs_ref[:, :] = x_ref[:]
    acc_t = jnp.int32 if kind == "int8" else jnp.float32

    K = xs_ref.shape[1]
    nslices = w_ref.shape[1] // K

    def body(i, _):
        d_ref[:, :] = jax.lax.dot_general(
            xs_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )
        # feed the output back into the activations so the chain has a real
        # data dependence (no hoisting), without overflow; the slice index
        # rotates DYNAMICALLY (ref-level pl.ds) so the compiler cannot
        # narrow the dot to a fixed column range
        off = pl.multiple_of((i % nslices) * K, K)
        dk = d_ref[:, pl.ds(off, K)]
        if kind == "int8":
            xs_ref[:, :] = jnp.clip(dk >> 8, -127, 127).astype(jnp.int8)
        else:
            xs_ref[:, :] = (dk * 1e-3).astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, iters, body, None)
    o_ref[:, :] = xs_ref[0:1, 0:128].astype(acc_t)


@functools.partial(jax.jit, static_argnames=("iters", "interpret", "kind"))
def run(x, w, *, iters, interpret, kind):
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, kind=kind),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (1, 128), jnp.int32 if kind == "int8" else jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(x.shape, x.dtype),
            pltpu.VMEM(
                (x.shape[0], w.shape[1]),
                jnp.int32 if kind == "int8" else jnp.float32,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    M, K, N = 1024, 1280, 5120
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-8, 9, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-8, 9, (K, N)), jnp.int8)

    # numerics: one iteration of the kernel's dot vs XLA int32
    got = np.asarray(run(x8, w8, iters=1, interpret=args.interpret,
                         kind="int8"))
    ref = jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    want = np.clip(np.asarray(ref)[0:1, 0:128] >> 8, -127, 127)
    np.testing.assert_array_equal(got, want)
    print("int8 kernel numerics: OK")

    if args.interpret:
        return

    xb = jnp.asarray(rng.standard_normal((M, K)) * 0.02, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    short, long = 512, 4096
    for kind, xx, ww in (("bf16", xb, wb), ("int8", x8, w8)):
        for iters in (short, long):
            np.asarray(run(xx, ww, iters=iters, interpret=False, kind=kind))
        ts = {}
        for iters in (short, long):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(
                    run(xx, ww, iters=iters, interpret=False, kind=kind)
                )
                best = min(best, time.perf_counter() - t0)
            ts[iters] = best
        flops = 2 * M * K * N * (long - short)
        rate = flops / max(ts[long] - ts[short], 1e-9)
        print(f"  {kind}: {rate/1e12:7.1f} T/s  ({short}it {ts[short]:.3f}s, "
              f"{long}it {ts[long]:.3f}s)")


if __name__ == "__main__":
    main()
