"""Decompose the Stage-3 train step's time budget (VERDICT r1 task 3 triage).

Times value_and_grad of each layer component at the full training shapes
(B=32, L=1024, d=512, 16 layers' worth), as honest scan chains (tunnel
protocol).  Comparing the summed component times against the measured
252 ms/step locates where the backward's ~2/3-of-peak gap lives before
committing to custom_vjp kernels.

Run on chip: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_train_decomp.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla


def chain(fn, args_list, iters=16, runs=3):
    """Best steady seconds for `iters` chained fwd+bwd of fn (sum-of-outputs
    loss).  Data dependence: the scalar grad-sum feeds back into every input."""
    grad_fn = jax.value_and_grad(
        lambda *a: fn(*a).astype(jnp.float32).sum(), argnums=tuple(range(len(args_list)))
    )

    @jax.jit
    def many(args):
        def body(carry, _):
            stepped = [a + carry.astype(a.dtype) for a in args]
            val, grads = grad_fn(*stepped)
            s = val + sum(g.astype(jnp.float32).sum() for g in grads)
            return jnp.abs(s).astype(jnp.int32) % 2, s
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums

    t0 = time.perf_counter()
    np.asarray(many(args_list))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(many(args_list))
        best = min(best, time.perf_counter() - t0)
    return best / iters, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--probes", nargs="*", default=None)
    args = ap.parse_args()

    B, L, d, H, Dh, W, F = args.batch, 1024, 512, 16, 32, 128, 2048
    nl = 8  # local heads
    rng = np.random.default_rng(0)

    def t(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    probes = {}

    # --- attention ops at per-layer shapes ---
    qkv = (t(B, nl, L, Dh), t(B, nl, L, Dh), t(B, nl, L, Dh))
    probes["local_attn(8h)"] = (
        lambda q, k, v: local_window_attention_xla(q, k, v, window=W), qkv
    )
    probes["linear_attn(8h)"] = (linear_attention, qkv)

    # --- projections: qkv + out at per-layer shapes ---
    x2 = t(B * L, d)
    wqkv = t(d, 3 * d)
    wo = t(d, d)
    probes["qkvo_proj"] = (
        lambda x, w1, w2: (x @ w1)[:, :d] @ w2, (x2, wqkv, wo)
    )

    # --- FF with LN, per-layer shapes ---
    w1, w2 = t(d, F), t(F, d)
    ls = t(d, dtype=jnp.float32)

    def ff(x, w1, w2, ls):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ls).astype(x.dtype)
        h = jax.nn.gelu(xn @ w1, approximate=False)
        return x + h @ w2

    probes["ln_ff"] = (ff, (x2, w1, w2, ls))

    # --- head-split/merge relayout cost (transpose/reshape only) ---
    def split_merge(x):
        B_, L_ = B, L
        z = x.reshape(B_, L_, H, Dh).transpose(0, 2, 1, 3)
        return z.transpose(0, 2, 1, 3).reshape(B_, L_ * H * Dh // (H * Dh), H * Dh)

    probes["split_merge"] = (split_merge, (t(B, L, d),))

    selected = args.probes or list(probes)
    print(f"device={jax.devices()[0]} B={B} L={L} d={d} iters={args.iters}")
    total = 0.0
    for name in selected:
        fn, a = probes[name]
        sec, comp = chain(fn, list(a), iters=args.iters)
        per_layer_ms = sec * 1e3
        total += per_layer_ms
        print(f"{name:16s}: {per_layer_ms:7.2f} ms fwd+bwd/layer "
              f"(x{args.depth} = {per_layer_ms*args.depth:6.1f} ms)  "
              f"compile {comp:.0f}s")
    print(f"sum x{args.depth} layers ~= {total*args.depth:.0f} ms "
          f"(measured step: 252 ms at B=32)")


if __name__ == "__main__":
    main()
