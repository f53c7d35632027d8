"""On-chip A/B: full PenCL pair forward across int8 quant combos.

One process, interleaved runs (tunnel measurement protocol, BACKLOG #2),
LICM-proof chains (data-dependent 0/1 added to BOTH tower inputs —
CLAUDE.md bench rule), tiny host fetches.  Combos:

  * esm_ff      — ESM2 tower FF int8 (current bench default) vs none
  * esm_proj    — + ESM2 q/k/v/out projections int8
  * bert_ff     — + BERT tower FF int8

Every combo also reports min embedding cosine (z_t and z_p) vs the
bf16/erf XLA reference graph on the same params — the bench's drift gate.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_pencl_quant.py \
        [--batch 16] [--iters 8]
"""

from __future__ import annotations

import argparse
import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import PenCLConfig
from biom3_tpu.models.pencl import PenCL, ProjectionHead
from biom3_tpu.ops.pallas.bert_stack_tpu import (
    bert_embed,
    bert_stack_arrays,
    fused_bert_cls,
)
from biom3_tpu.ops.pallas.esm2_stack_tpu import esm2_stack_arrays, fused_esm2_cls
from biom3_tpu.utils.flops import pencl_pair_forward_flops


def host_init(init_fn, *shaped_args):
    shapes = jax.eval_shape(init_fn, jax.random.key(0), *shaped_args)
    rng = np.random.default_rng(0)
    leaves, treedef = jax.tree.flatten(shapes)
    arrs = [
        jnp.asarray((rng.standard_normal(l.shape) * 0.02).astype(l.dtype))
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, arrs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the XLA reference graph (faster, no cosines)")
    ap.add_argument("--vpu", action="store_true",
                    help="A/B the exact-math VPU opts (exp2-folded softmax "
                         "+ one-read LayerNorms) on the full-int8 combo")
    ap.add_argument("--bert-proj", action="store_true",
                    help="A/B BERT q/k/v/out int8 on top of the full-int8 "
                         "serving default")
    args = ap.parse_args()

    cfg = PenCLConfig()
    B, iters = args.batch, args.iters
    model = PenCL(cfg, dtype=jnp.bfloat16)
    x_t = jnp.zeros((B, cfg.text_max_length), jnp.int32)
    x_p = jnp.ones((B, cfg.seq_max_length), jnp.int32)
    params = host_init(model.init, x_t[:1], x_p[:1])
    proj = ProjectionHead(cfg.proj_dim, cfg.dropout, jnp.bfloat16)
    flops_pair = pencl_pair_forward_flops(cfg)
    print(f"device: {jax.devices()[0]}  B={B} iters={iters}")

    ref_zt = ref_zp = None
    if not args.skip_ref:
        ref_out = jax.jit(lambda p, t, x: model.apply(p, t, x))(
            params, x_t[:4], x_p[:4]
        )
        ref_zt = np.asarray(ref_out["text_joint_latent"], np.float32)
        ref_zp = np.asarray(ref_out["seq_joint_latent"], np.float32)

    combos = [
        # (esm_ff, esm_proj, bert_ff, vpu: softmax_opt+ln_onepass,
        #  bert_proj)
        ("none", "none", "none", False, "none"),
        ("int8", "none", "none", False, "none"),  # pre-r3 bench default
        ("int8", "int8", "none", False, "none"),
        ("int8", "none", "int8", False, "none"),
        ("int8", "int8", "int8", False, "none"),
    ]
    if args.vpu:
        # vpu field: False | True (both towers) | "esm" | "bert"
        combos = [
            ("int8", "int8", "int8", False, "none"),  # r3 serving default
            ("int8", "int8", "int8", True, "none"),
            ("int8", "int8", "int8", "esm", "none"),
            ("int8", "int8", "int8", "bert", "none"),
        ]
    if args.bert_proj:
        combos = [
            ("int8", "int8", "int8", False, "none"),  # r3 serving default
            ("int8", "int8", "int8", False, "int8"),
        ]
    arrays_cache = {}

    def get_arrays(esm_ff, esm_proj, bert_ff, bert_proj):
        key = (esm_ff, esm_proj, bert_ff, bert_proj)
        if key not in arrays_cache:
            arrays_cache[key] = {
                "esm": esm2_stack_arrays(
                    params["params"]["protein_encoder"], cfg.esm.num_layers,
                    jnp.bfloat16, ff_quant=esm_ff, proj_quant=esm_proj,
                ),
                "bert": bert_stack_arrays(
                    params["params"]["text_encoder"], cfg.bert.num_layers,
                    jnp.bfloat16, ff_quant=bert_ff, proj_quant=bert_proj,
                ),
            }
        return arrays_cache[key]

    for esm_ff, esm_proj, bert_ff, vpu, bert_proj in combos:
        arrays = get_arrays(esm_ff, esm_proj, bert_ff, bert_proj)

        vpu_esm = vpu in (True, "esm")
        vpu_bert = vpu in (True, "bert")

        def pair_forward(params, arrays, x_t, x_p,
                         esm_ff=esm_ff, esm_proj=esm_proj, bert_ff=bert_ff,
                         vpu_esm=vpu_esm, vpu_bert=vpu_bert,
                         bert_proj=bert_proj):
            x0 = bert_embed(params["params"]["text_encoder"], x_t)
            t_cls = fused_bert_cls(
                x0, **arrays["bert"], heads=cfg.bert.num_heads, gelu="tanh",
                ff_quant=bert_ff, proj_quant=bert_proj,
                softmax_opt=vpu_bert, ln_onepass=vpu_bert,
            )
            z_t = proj.apply(
                {"params": params["params"]["text_projection"]},
                t_cls.astype(jnp.bfloat16),
            )
            cls = fused_esm2_cls(
                x_p, **arrays["esm"], heads=cfg.esm.attention_heads,
                gelu="tanh", ff_quant=esm_ff, proj_quant=esm_proj,
                softmax_opt=vpu_esm, ln_onepass=vpu_esm,
            )
            z_p = proj.apply(
                {"params": params["params"]["protein_projection"]},
                cls.astype(jnp.bfloat16),
            )
            return z_t, z_p

        @jax.jit
        def many(params, arrays, x_t, x_p, pair_forward=pair_forward):
            def body(carry, _):
                z_t, z_p = pair_forward(params, arrays, x_t + carry,
                                        x_p + carry)
                s = z_t.sum() + z_p.sum()
                return jnp.abs(s).astype(jnp.int32) % 2, s
            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return sums

        tag = (f"esm_ff={esm_ff} esm_proj={esm_proj} bert_ff={bert_ff}"
               + (f" vpu={vpu}" if vpu else "")
               + (f" bert_proj={bert_proj}" if bert_proj != "none" else ""))
        try:
            t0 = time.perf_counter()
            np.asarray(many(params, arrays, x_t, x_p))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                np.asarray(many(params, arrays, x_t, x_p))
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — report and continue combos
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        pairs_s = B * iters / best
        tfs = flops_pair * B * iters / best / 1e12

        cos_txt = ""
        if ref_zt is not None:
            zt, zp = jax.jit(
                lambda p, a, t, x, f=pair_forward: f(p, a, t, x)
            )(params, arrays, x_t[:4], x_p[:4])
            cos_min = 1.0
            for zf, zr in ((np.asarray(zt, np.float32), ref_zt),
                           (np.asarray(zp, np.float32), ref_zp)):
                cos = (zf * zr).sum(-1) / (
                    np.linalg.norm(zf, axis=-1) * np.linalg.norm(zr, axis=-1)
                )
                cos_min = min(cos_min, float(cos.min()))
            cos_txt = f"  min_cos {cos_min:.6f}"
        print(f"{tag}: {best:.3f}s  {pairs_s:6.1f} pairs/s  "
              f"{tfs:6.1f} TF/s-eq  (compile {compile_s:.0f}s){cos_txt}")


if __name__ == "__main__":
    main()
