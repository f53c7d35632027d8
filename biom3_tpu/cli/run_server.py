"""Online text→protein serving daemon (capability the reference lacks).

Loads all three stages once, keeps the compiled executables resident, and
serves concurrent HTTP requests with continuous micro-batching
(`biom3_tpu.serving`).  The reference's inference story is three one-shot
scripts exchanging ``.pt`` files; this is the production counterpart.

  python -m biom3_tpu.cli.run_server \
      --stage1_json ... --stage1_model ... \
      --stage2_json ... --stage2_model ... \
      --stage3_json ... --stage3_model ... \
      --port 8000 --rows_per_dispatch 16

  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/generate \
      -d '{"prompt": "membrane transport protein", "num_replicas": 3}'
"""

from __future__ import annotations

import argparse

from biom3_tpu.config import load_json_config


# Chip-certified serving bundles (PARITY.md certification tables +
# outputs/chip_session_logs r4/r5): each preset sets the flags below
# unless the flag was given explicitly.  quality = the reference's exact
# OA-ARDM semantics; latency = blocked k=8 at temperature 0, certified
# quality-neutral (PARITY.md "Blocked decoding certification");
# throughput = MaskGIT parallel decoding (framework extension, 16
# forwards/design) on the row-granular trajectory scheduler.
PRESETS = {
    "quality": {
        "sampler": "ardm", "decode_order": "path", "temperature": 1.0,
        "positions_per_step": 1, "chunk_steps": 64,
        "rows_per_dispatch": 32, "continuous": "on",
    },
    "latency": {
        "sampler": "ardm", "decode_order": "path", "temperature": 0.0,
        "positions_per_step": 8, "chunk_steps": 16,
        "rows_per_dispatch": 32, "continuous": "off",
        # r5 A/B: the trajectory scheduler serves blocked-k8-t0 at 13.8
        # seqs/s @ occupancy 1.00 (98% of the 14.05 offline rate) vs
        # 12.3 @ 0.97 through the continuous scheduler (r4) —
        # ~16-forward trajectories have no useful chunk boundaries
    },
    "throughput": {
        "sampler": "maskgit", "maskgit_steps": 16, "temperature": 1.0,
        "rows_per_dispatch": 32, "continuous": "off",
    },
}


def parse_arguments():
    p = argparse.ArgumentParser(description="BioM3 serving daemon")
    for stage in (1, 2, 3):
        p.add_argument(f"--stage{stage}_json", type=str, required=True)
        p.add_argument(f"--stage{stage}_model", type=str, required=True)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="chip-certified config bundle (quality: exact "
                        "reference ARDM; latency: blocked k=8 temp-0, "
                        "certified quality-neutral; throughput: maskgit "
                        "parallel decoding).  Explicit flags override "
                        "preset values")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--rows_per_dispatch", type=int, default=16,
                   help="fixed Stage-3 device batch (prompt×replica rows); "
                        "every dispatch reuses one compiled executable")
    p.add_argument("--num_replicas", type=int, default=2,
                   help="default replicas per prompt when the request "
                        "doesn't specify")
    p.add_argument("--max_wait_ms", type=float, default=50.0,
                   help="batch coalescing window after the first request")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--embed_cache", type=int, default=4096,
                   help="prompt → (z_t, z_c) LRU entries (repeated "
                        "prompts skip the text tower + facilitator "
                        "dispatch; bit-identical values); 0 disables")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--positions_per_step", type=int, default=1,
                   help=">1 enables blocked fast decoding (certified for "
                        "temp 0 in PARITY.md)")
    p.add_argument("--ff-quant", choices=["auto", "none", "int8"], default="auto")
    p.add_argument("--proj-quant", choices=["auto", "none", "int8"], default="auto")
    p.add_argument("--decode_order", choices=["path", "confidence"],
                   default="path")
    p.add_argument("--sampler", choices=["ardm", "maskgit"], default="ardm")
    p.add_argument("--maskgit_steps", type=int, default=16)
    p.add_argument("--mesh_dp", type=int, default=1,
                   help="spread Stage-3 rows over a dp-axis device mesh "
                        "(multi-chip serving; rows_per_dispatch must be a "
                        "multiple of mesh_dp*mesh_fsdp)")
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--chunk_steps", type=int, default=64,
                   help="sampler dispatch chunk (outer steps); also the "
                        "continuous batcher's admission granularity.  "
                        "Measured r4: 64 reaches occupancy 1.00 / 99%% of "
                        "the offline rate at 64 rows in flight (128: "
                        "0.97 / 96%% — r4_serving_chunk64_r32x4.log)")
    p.add_argument("--continuous", choices=["auto", "on", "off"],
                   default="auto",
                   help="chunk-boundary continuous batching for generate "
                        "(auto: on for exact path-order ARDM, off for "
                        "maskgit/confidence fast modes)")
    p.add_argument("--continuous_inpaint", action="store_true",
                   help="route inpaint through the continuous scheduler "
                        "(reference random-order resume semantics, shares "
                        "dispatches with generate; default: packed "
                        "confidence-order inpainter — the certified "
                        "quality winner)")
    p.add_argument("--packed_scheduler", choices=["trajectory", "micro"],
                   default="trajectory",
                   help="scheduler for non-continuous generate (fast "
                        "modes): row-granular depth-1-pipelined "
                        "TrajectoryBatcher (default) or the legacy "
                        "request-granular MicroBatcher (A/B baseline)")
    p.add_argument("--warmup", action="store_true",
                   help="compile every serving executable (embed, generate, "
                        "inpaint) with dummy dispatches before accepting "
                        "traffic — first clients skip the compile wait")
    args = p.parse_args()
    if args.preset:
        # a preset fills every flag the user left at its parser default
        # (passing the default value explicitly is indistinguishable and
        # also gets the preset value — document, don't guess)
        for flag, value in PRESETS[args.preset].items():
            if getattr(args, flag) == p.get_default(flag):
                setattr(args, flag, value)
    return args


def main() -> None:
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.stage2 import FacilitatorEngine
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from biom3_tpu.serving import BioM3Server, ServingPipeline

    args = parse_arguments()
    s1 = PenCLEngine(
        load_json_config(args.stage1_json), args.stage1_model, text_only=True
    )
    s2 = FacilitatorEngine(load_json_config(args.stage2_json), args.stage2_model)
    s3 = ProteoScribeEngine(
        load_json_config(args.stage3_json), args.stage3_model,
        temperature=args.temperature,
        chunk_steps=args.chunk_steps,
        positions_per_step=args.positions_per_step,
        # "auto" = engine default (int8 on the TPU stack path, r3)
        ff_quant=None if args.ff_quant == "auto" else args.ff_quant,
        proj_quant=(None if args.proj_quant == "auto"
                    else args.proj_quant),
        decode_order=args.decode_order,
        sampler_mode=args.sampler, maskgit_steps=args.maskgit_steps,
    )
    mesh = None
    if args.mesh_dp * args.mesh_fsdp > 1:
        from biom3_tpu.parallel.mesh import MeshConfig, make_mesh

        mesh = make_mesh(MeshConfig(dp=args.mesh_dp, fsdp=args.mesh_fsdp))
    pipeline = ServingPipeline(
        s1, s2, s3,
        rows_per_dispatch=args.rows_per_dispatch,
        default_replicas=args.num_replicas,
        seed=args.seed,
        mesh=mesh,
        embed_cache=args.embed_cache,
    )
    server = BioM3Server(
        pipeline, host=args.host, port=args.port,
        max_wait_s=args.max_wait_ms / 1000.0,
        continuous=(None if args.continuous == "auto"
                    else args.continuous == "on"),
        continuous_inpaint=args.continuous_inpaint,
        packed_scheduler=args.packed_scheduler,
    )
    if args.warmup:
        print("warming up (compiling serving executables)...", flush=True)
        times = server.warmup()
        print(f"warmup done: {times}", flush=True)
    print(f"serving on http://{server.host}:{server.port}", flush=True)

    import signal

    def shutdown(signum, frame):
        # break out of serve_forever on THIS thread; the actual close runs
        # after it returns (calling httpd.shutdown() from inside the
        # handler would deadlock: it waits on the serve loop the handler
        # itself suspended)
        print(f"signal {signum}: shutting down", flush=True)
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, shutdown)
    try:
        server.serve_forever()
    except (KeyboardInterrupt, SystemExit):
        pass
    finally:
        # drains in-flight batches, fails stranded futures, stops accepting
        server.close()


if __name__ == "__main__":
    main()
