"""A/B the local-attention training form (VERDICT r1 task 3).

exp_train_decomp measured the windowed look-around implementation at
8.25 ms/layer fwd+bwd (B=32) for ~1.2 GF — the step's dominant cost.
Candidates (identical math where the band mask matches):

  windowed   — current ops/local_attention.py (look_around concat)
  dense_band — full (L, L) attention with the |i//W - j//W| <= 1 mask
               (more FLOPs, but two big clean matmuls; XLA's standard
               attention backward)
  dense_flash— dense_band under jax.checkpoint (recompute scores in bwd
               instead of saving the (L, L) probs)

Also times linear attention head-batched vs per-call.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.ops.linear_attention import linear_attention
from biom3_tpu.ops.local_attention import local_window_attention_xla

NEG_INF = -1e9


def dense_band_attention(q, k, v, *, window):
    *lead, L, D = q.shape
    wi = jnp.arange(L) // window
    band = jnp.abs(wi[:, None] - wi[None, :]) <= 1
    dots = jnp.einsum(
        "...id,...jd->...ij", q, k, preferred_element_type=jnp.float32
    ) * (D ** -0.5)
    dots = jnp.where(band, dots, NEG_INF)
    p = jax.nn.softmax(dots, axis=-1)
    return jnp.einsum(
        "...ij,...jd->...id", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def chain(fn, args_list, iters=16, runs=3):
    grad_fn = jax.value_and_grad(
        lambda *a: fn(*a).astype(jnp.float32).sum(),
        argnums=tuple(range(len(args_list))),
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
    args = ap.parse_args()

    B, L, Dh, W, nl = args.batch, 1024, 32, 128, 8
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)
        ).astype(jnp.bfloat16)

    qkv = (t(B, nl, L, Dh), t(B, nl, L, Dh), t(B, nl, L, Dh))
    print(f"device={jax.devices()[0]} B={B} local_heads={nl} L={L} Dh={Dh}")

    # numeric check first (f32, small)
    qs = tuple(a[:1].astype(jnp.float32) for a in qkv)
    ref = local_window_attention_xla(*qs, window=W)
    got = dense_band_attention(*qs, window=W)
    print("max |dense_band - windowed| (f32):",
          float(jnp.max(jnp.abs(ref - got))))

    variants = {
        "windowed": lambda q, k, v: local_window_attention_xla(q, k, v, window=W),
        "dense_band": lambda q, k, v: dense_band_attention(q, k, v, window=W),
        "dense_remat": jax.checkpoint(
            lambda q, k, v: dense_band_attention(q, k, v, window=W)
        ),
        "linear": linear_attention,
    }
    for name, fn in variants.items():
        sec, comp = chain(fn, list(qkv), iters=args.iters)
        print(f"{name:12s}: {sec*1e3:7.2f} ms fwd+bwd/layer "
              f"(x16 = {sec*16e3:6.1f} ms)  compile {comp:.0f}s", flush=True)


if __name__ == "__main__":
    main()
