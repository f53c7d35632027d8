"""On-chip A/B: fused ESM2 stack kernel vs the current XLA+flash tower.

Interleaved same-process runs (tunnel measurement protocol, BACKLOG #2),
LICM-proof chains (a data-dependent 0/1 added to the token input of every
iteration — CLAUDE.md bench rule), tiny host fetches.

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_esm2_stack.py \
      --batch 16 --iters 8 --rows 1 2
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import ESM2Config
from biom3_tpu.models.esm2 import ESM2
from biom3_tpu.ops.pallas.esm2_stack_tpu import esm2_stack_arrays, fused_esm2_cls

ESM_FWD_TFLOP_PER_SEQ = None  # filled from utils.flops


def chain_time(fn, weights, x, iters, runs=3):
    """Best steady-state seconds for `iters` chained forwards.

    ``weights`` is passed as a jit ARGUMENT (a closure would capture 2.6 GB
    of params as lowering constants and stall the compiler)."""
    @jax.jit
    def many(weights, x):
        def body(carry, _):
            out = fn(weights, x + carry)              # (B, E) CLS
            s = out.sum()
            return jnp.abs(s).astype(jnp.int32) % 2, s
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return sums
    t0 = time.perf_counter()
    np.asarray(many(weights, x))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(many(weights, x))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rows", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--wbuf", type=int, nargs="*", default=[2])
    ap.add_argument("--ffbuf", type=int, nargs="*", default=[2])
    ap.add_argument("--ff-block", type=int, nargs="*", default=[256])
    ap.add_argument("--ff-quant", type=str, nargs="*", default=["none"],
                    choices=["none", "int8"])
    ap.add_argument("--proj-quant", type=str, nargs="*", default=["none"],
                    choices=["none", "int8"])
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--ablate", type=str, nargs="*", default=[],
                    help="timing-only kernel ablations to run on the int8 "
                         "serving combo: no_rot no_dots no_softmax no_ff")
    args = ap.parse_args()

    from biom3_tpu.utils.flops import esm2_forward_flops

    cfg = ESM2Config()
    B, L = args.batch, cfg.max_len
    rng = np.random.default_rng(0)
    toks = np.concatenate([
        np.zeros((B, 1), np.int32),
        rng.integers(4, 24, (B, 900)).astype(np.int32),
        np.full((B, 1), 2, np.int32),
        np.full((B, L - 902), 1, np.int32),
    ], axis=1)
    x = jnp.asarray(toks)
    flops = esm2_forward_flops(cfg, B) * args.iters
    print(f"device={jax.devices()[0]} B={B} iters={args.iters} "
          f"tower_flops/iter={flops/args.iters/1e12:.2f} TF")

    model = ESM2(cfg, dtype=jnp.bfloat16, attn_impl="pallas:1024:1024",
                 gelu="tanh")
    params = None
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )
    leaves, treedef = jax.tree.flatten(shapes)
    host = np.random.default_rng(1)
    params = jax.tree.unflatten(
        treedef,
        [jnp.asarray((host.standard_normal(l.shape) * 0.02).astype(l.dtype))
         for l in leaves],
    )

    results = {}
    ref_cls = None
    if not args.skip_xla:
        def xla_fwd(p, xx):
            return model.apply(p, xx)["hidden"][:, 0, :]
        best, comp = chain_time(xla_fwd, params, x, args.iters)
        rate = B * args.iters / best
        print(f"xla+flash(tanh):  {best:.3f}s  {rate:.1f} seq/s  "
              f"{flops/best/1e12:.1f} TF/s  (compile {comp:.0f}s)")
        results["xla"] = rate
        ref_cls = np.asarray(jax.jit(xla_fwd)(params, x), np.float32)

    quants = list(dict.fromkeys(
        (fq, pq) for fq in args.ff_quant for pq in args.proj_quant
    ))
    arrays_by_quant = {
        (fq, pq): esm2_stack_arrays(
            params["params"], cfg.num_layers, jnp.bfloat16,
            ff_quant=fq, proj_quant=pq,
        )
        for fq, pq in quants
    }
    combos = [
        (rows, wbuf, ffbuf, ffb, q)
        for rows in args.rows
        for wbuf in args.wbuf
        for ffbuf in args.ffbuf
        for ffb in args.ff_block
        for q in quants
    ]
    for rows, wbuf, ffbuf, ffb, q in combos:
        arrays = arrays_by_quant[q]
        def fused_fwd(arrs, xx, rows=rows, wbuf=wbuf, ffbuf=ffbuf, ffb=ffb,
                      q=q):
            return fused_esm2_cls(
                xx, **arrs, heads=cfg.attention_heads, rows=rows,
                ff_block_l=ffb, gelu="tanh",
                w_buffers=wbuf, ff_buffers=ffbuf,
                ff_quant=q[0], proj_quant=q[1],
            )
        tag = (f"rows={rows} wbuf={wbuf} ffbuf={ffbuf} ffb={ffb} "
               f"ffq={q[0]} projq={q[1]}")
        try:
            best, comp = chain_time(fused_fwd, arrays, x, args.iters)
        except Exception as e:  # noqa: BLE001 — report and continue variants
            print(f"fused {tag}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        rate = B * args.iters / best
        print(f"fused {tag}: {best:.3f}s  {rate:.1f} seq/s  "
              f"{flops/best/1e12:.1f} TF/s  (compile {comp:.0f}s)")
        results[tag] = rate
        if ref_cls is not None:
            got = np.asarray(jax.jit(fused_fwd)(arrays, x), np.float32)
            cos = (got * ref_cls).sum(-1) / (
                np.linalg.norm(got, axis=-1) * np.linalg.norm(ref_cls, axis=-1)
            )
            print(f"  CLS cosine vs xla path: min {cos.min():.6f}")

    if args.ablate:
        # timing-only decomposition on the int8 serving combo (WRONG math
        # in the ablated variants — where does the tower's time go?)
        arrays = esm2_stack_arrays(params["params"], cfg.num_layers,
                                   jnp.bfloat16, ff_quant="int8",
                                   proj_quant="int8")
        for ab in ["", *args.ablate]:
            def fwd(arrs, xx, ab=ab):
                return fused_esm2_cls(
                    xx, **arrs, heads=cfg.attention_heads, gelu="tanh",
                    ff_quant="int8", proj_quant="int8", ablate=ab,
                )
            try:
                best, comp = chain_time(fwd, arrays, x, args.iters)
            except Exception as e:  # noqa: BLE001
                print(f"ablate={ab or 'base'}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            print(f"ablate={ab or 'base'}: {best:.3f}s  "
                  f"{B * args.iters / best:.1f} seq/s  (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
