"""On-chip serving-daemon benchmark: HTTP round-trip throughput/latency.

Builds the full three-stage pipeline at (near-)reference serving shapes
with random-init weights — no published checkpoints or tokenizer files
exist in this sandbox, so the text tower gets a synthetic wordpiece vocab
(dims unchanged; tokenizer cost is not the bottleneck) — starts the real
`BioM3Server` in-process, and drives it with the concurrent load
generator (`tools/load_test_server.py`).  The number that matters is
sequences/s through the WHOLE daemon (HTTP + batcher + three stages) vs
the bare-sampler bench: the gap is serving overhead.

  python tools/bench_serving.py --rows 16 --clients 8 --requests 2 \
      --positions-per-step 8 --decode-order confidence

``--tiny`` shrinks every stage for a CPU smoke run.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16,
                    help="rows_per_dispatch (fixed Stage-3 device batch)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=2,
                    help="sequential requests per client")
    ap.add_argument("--replicas", type=int, default=1)
    ap.add_argument("--positions-per-step", type=int, default=1)
    ap.add_argument("--decode-order", choices=["path", "confidence"],
                    default="path")
    ap.add_argument("--sampler", choices=["ardm", "maskgit"], default="ardm")
    ap.add_argument("--maskgit-steps", type=int, default=16)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--ff-quant", choices=["auto", "none", "int8"], default="auto")
    ap.add_argument("--proj-quant", choices=["auto", "none", "int8"], default="auto")
    ap.add_argument("--endpoint", choices=["generate", "inpaint", "mixed"],
                    default="generate",
                    help="mixed = half the clients generate, half inpaint "
                         "(the continuous scheduler serves both row kinds "
                         "from the same dispatches)")
    ap.add_argument("--inpaint-len", type=int, default=300,
                    help="residues in the synthetic inpaint request")
    ap.add_argument("--inpaint-masked-frac", type=float, default=0.25)
    ap.add_argument("--chunk-steps", type=int, default=128,
                    help="sampler dispatch chunk (outer steps) = the "
                         "continuous batcher's admission granularity")
    ap.add_argument("--continuous", choices=["auto", "on", "off"],
                    default="auto",
                    help="chunk-boundary continuous batching for generate "
                         "(auto: server default — on for exact ARDM)")
    ap.add_argument("--packed-scheduler", choices=["trajectory", "micro"],
                    default="trajectory",
                    help="non-continuous generate scheduler: row-granular "
                         "depth-1-pipelined (default) vs legacy request-"
                         "granular MicroBatcher (A/B baseline)")
    ap.add_argument("--embed-cache", type=int, default=4096,
                    help="prompt embed LRU entries (0 disables — the "
                         "no-cache A/B control)")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()

    import jax.numpy as jnp

    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.stage2 import FacilitatorEngine
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from biom3_tpu.serving import BioM3Server, ServingPipeline
    from biom3_tpu.tokenizers.synthetic import write_synthetic_wordpiece
    from load_test_server import run_load

    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    vocab_size = write_synthetic_wordpiece(pathlib.Path(tmp) / "tok")

    from bench_common import stage_configs

    s1_cfg, s2_cfg, s3_cfg = stage_configs(args.tiny, batch=args.rows)
    s1_cfg["bert_vocab_size"] = vocab_size
    s1_cfg["text_model_path"] = f"{tmp}/tok"

    t0 = time.time()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    s1 = PenCLEngine(Config(s1_cfg), None, text_only=True, dtype=dtype)
    s2 = FacilitatorEngine(Config(s2_cfg), None)
    s3 = ProteoScribeEngine(
        Config(s3_cfg), None, dtype=dtype,
        temperature=args.temperature,
        chunk_steps=args.chunk_steps,
        positions_per_step=args.positions_per_step,
        decode_order=args.decode_order,
        # "auto" = engine default (int8 on the TPU stack path, r3)
        ff_quant=None if args.ff_quant == "auto" else args.ff_quant,
        proj_quant=(None if args.proj_quant == "auto"
                    else args.proj_quant),
        sampler_mode=args.sampler, maskgit_steps=args.maskgit_steps,
    )
    pipeline = ServingPipeline(
        s1, s2, s3, rows_per_dispatch=args.rows,
        default_replicas=args.replicas,
        embed_cache=args.embed_cache,
    )
    # compiles ride the first request (below); the stack-kernel/maskgit
    # executables have been observed at up to ~930 s through the tunnel's
    # remote compiler, so the warmup window needs a far longer deadline
    # than the 600 s serving default
    # resolve --continuous auto BEFORE building the server so inpaint rows
    # ride the same scheduler as generate whenever the server ends up
    # continuous — a mixed-mode run must be attributable to ONE scheduler
    # (packed inpaint remains reachable with --continuous off)
    continuous = (s3.supports_continuous_stepping()
                  if args.continuous == "auto" else args.continuous == "on")
    server = BioM3Server(pipeline, port=0, max_wait_s=0.05,
                         request_timeout_s=2400.0,
                         continuous=continuous,
                         continuous_inpaint=(continuous
                                             and args.endpoint
                                             in ("inpaint", "mixed")),
                         packed_scheduler=args.packed_scheduler)
    server.start()
    base = f"http://{server.host}:{server.port}"
    sequence = None
    if args.endpoint in ("inpaint", "mixed"):
        if args.tiny:
            args.inpaint_len = min(args.inpaint_len, 30)  # tiny L=64
        # deterministic synthetic partial design: every Nth residue unknown
        import random

        rng = random.Random(0)
        n_mask = max(1, int(args.inpaint_len * args.inpaint_masked_frac))
        chars = [rng.choice("ACDEFGHIKLMNPQRSTVWY")
                 for _ in range(args.inpaint_len)]
        for i in rng.sample(range(args.inpaint_len), n_mask):
            chars[i] = "?"
        sequence = "".join(chars)
    # one warmup request owns every compile; retry until a request actually
    # completes so the measured phase never overlaps an in-flight compile
    # (a timed-out warmup returns 500 while the device compile continues —
    # that once inflated an inpaint+maskgit measured phase to 322 s wall)
    for attempt in range(3):
        warm = run_load(base, clients=1, requests_per_client=1,
                        num_replicas=args.replicas,
                        endpoint=args.endpoint, sequence=sequence,
                        timeout_s=2400.0)
        if warm.get("errors", 0) == 0:
            break
        print(json.dumps({"warmup_retry": attempt + 1, "warmup": warm}),
              flush=True)
    setup_s = time.time() - t0
    print(json.dumps({"warmup": warm, "setup_s": round(setup_s, 1)}),
          flush=True)

    # snapshot device counters so the measured phase's occupancy excludes
    # the warmup dispatches
    import urllib.request

    def metrics():
        with urllib.request.urlopen(f"{base}/v1/metrics", timeout=30) as r:
            return json.load(r)

    m0 = metrics()
    report = run_load(
        base, clients=args.clients, requests_per_client=args.requests,
        num_replicas=args.replicas,
        endpoint=args.endpoint, sequence=sequence,
    )
    m1 = metrics()
    d0, d1 = m0["device"], m1["device"]
    live = d1["rows_live"] - d0["rows_live"]
    padded = d1["rows_padded"] - d0["rows_padded"]
    report["device"] = {
        "generate_mode": m1.get("generate_mode"),
        "dispatches": d1["dispatches"] - d0["dispatches"],
        "rows_live": live,
        "rows_padded": padded,
        "row_occupancy": (
            round(live / (live + padded), 3) if live + padded else 0.0
        ),
    }
    report["config"] = {
        "endpoint": args.endpoint,
        "inpaint_len": (args.inpaint_len
                        if args.endpoint in ("inpaint", "mixed") else None),
        "inpaint_masked_frac": (
            args.inpaint_masked_frac
            if args.endpoint in ("inpaint", "mixed") else None
        ),
        "rows_per_dispatch": args.rows,
        "chunk_steps": args.chunk_steps,
        "positions_per_step": args.positions_per_step,
        "decode_order": args.decode_order,
        "sampler": args.sampler, "maskgit_steps": args.maskgit_steps,
        "temperature": args.temperature,
        "ff_quant": args.ff_quant, "proj_quant": args.proj_quant,
        "stack_path": s3.use_stack, "tiny": args.tiny,
        "continuous": server.continuous,
        "continuous_inpaint": server.continuous_inpaint,
        "packed_scheduler": server.packed_scheduler,
        "embed_cache": args.embed_cache,
        "inpaint_merged": server._inpaint_batcher is server._gen_batcher,
    }
    print(json.dumps(report), flush=True)
    server.close()


if __name__ == "__main__":
    main()
