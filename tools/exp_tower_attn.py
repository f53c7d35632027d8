"""On-chip A/B: Stage-1 tower attention impl — XLA einsum vs Pallas flash.

The towers (ESM2-650M L=1024, BERT L=512, head_dim 64) default to
``attn_impl="xla"`` (dtype-aware precision: bf16 MXU matmuls with f32
accumulation).  The Pallas flash kernel (`ops/pallas/flash_attention_tpu`)
keeps the (L, L) score matrix out of HBM; this measures whether that wins
at serving batch sizes on the real chip, using the bench's scan-chain
protocol (the tunnel's ~0.2 s dispatch latency makes single-op timings
meaningless — time an 8-iteration dependent scan, best of N).

Run: python tools/exp_tower_attn.py [--batch 16] [--iters 8] [--runs 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import PenCLConfig
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.utils.flops import pencl_pair_forward_flops


def time_impl(impl: str, cfg, params, x_t, x_p, iters: int, runs: int,
              tower: str = "pencl", gelu: str = "erf"):
    model = PenCL(cfg, dtype=jnp.bfloat16, attn_impl=impl, gelu=gelu)

    def fwd(params, x_t, x_p):
        if tower == "esm":
            return model.apply(params, x_p,
                               method=PenCL.encode_protein).sum()
        if tower == "bert":
            return model.apply(params, x_t, method=PenCL.encode_text).sum()
        out = model.apply(params, x_t, x_p)
        return out["text_joint_latent"].sum() + out["seq_joint_latent"].sum()

    @jax.jit
    def many(params, x_t, x_p):
        def body(carry, _):
            # both inputs carry-dependent: see bench.py bench_pencl — an
            # invariant input lets XLA LICM hoist that tower out of the scan
            s = fwd(params, x_t + carry, x_p + carry)
            return jnp.abs(s).astype(jnp.int32) % 2, s
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums

    t0 = time.perf_counter()
    np.asarray(many(params, x_t, x_p))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(many(params, x_t, x_p))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--tower", default="pencl",
                    choices=["pencl", "esm", "bert"])
    ap.add_argument("--gelu-tanh", action="store_true",
                    help="tanh-approx GELU (the bf16 serving mode)")
    ap.add_argument("--no-rotary", action="store_true",
                    help="cost probe: skip rotary embeddings (wrong math)")
    ap.add_argument("--rotary-vpu", action="store_true",
                    help="cost probe: pre-MXU split/concat rotate_half")
    ap.add_argument("--ln-bf16", action="store_true",
                    help="cost probe: LayerNorm outputs in bf16")
    args = ap.parse_args()

    if args.ln_bf16:  # cost probe: bf16 LN output (stats still f32)
        import flax.linen as _nn
        _LN = _nn.LayerNorm
        class _LNbf16(_LN):
            pass
        import biom3_tpu.models.esm2 as _esm2m
        _esm2m.nn.LayerNorm = lambda **kw: _LN(
            **{**kw, "dtype": jnp.bfloat16})
    if args.no_rotary:  # cost probe (wrong math, representative cost)
        import biom3_tpu.models.esm2 as _esm2
        _esm2.apply_rotary = lambda x, cos, sin: x
    if args.rotary_vpu:  # cost probe: the pre-MXU rotate_half formulation
        import biom3_tpu.ops.rotary as _rot
        import biom3_tpu.models.esm2 as _esm2
        _esm2.apply_rotary = (
            lambda x, cos, sin: x * cos + _rot.rotate_half(x) * sin)

    cfg = PenCLConfig()
    B = args.batch
    x_t = jnp.zeros((B, cfg.text_max_length), jnp.int32)
    x_p = jnp.ones((B, cfg.seq_max_length), jnp.int32)
    model = PenCL(cfg, dtype=jnp.bfloat16)
    # eval_shape + host RNG (bench.py's _host_init): avoids compiling the
    # giant on-device init graph for the 650M-param towers
    shapes = jax.eval_shape(model.init, jax.random.key(0), x_t[:1], x_p[:1])
    hostrng = np.random.default_rng(0)
    leaves, treedef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(treedef, [
        jnp.asarray((hostrng.standard_normal(l.shape) * 0.02).astype(l.dtype))
        for l in leaves
    ])
    flops = pencl_pair_forward_flops(cfg) * B * args.iters

    print(f"device: {jax.devices()[0].device_kind}  B={B} iters={args.iters} "
          f"tower={args.tower}")
    for impl in args.impls.split(","):
        best, compile_s = time_impl(impl, cfg, params, x_t, x_p,
                                    args.iters, args.runs, tower=args.tower,
                                    gelu="tanh" if args.gelu_tanh else "erf")
        pairs = B * args.iters / best
        tf = flops / best / 1e12
        print(f"  {impl:8s} {best*1e3:8.1f} ms  {pairs:7.1f} pairs/s "
              f"~{tf:6.1f} TF/s  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
