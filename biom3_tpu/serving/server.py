"""Text→protein serving: the three-stage pipeline behind an HTTP API.

The reference distributes BioM3 as three one-shot scripts exchanging ``.pt``
files (SURVEY.md §1 — run_PenCL_inference.py → run_Facilitator_sample.py →
run_ProteoScribe_sample.py); there is no online serving surface.  This
module is the production counterpart: one process keeps all three
compiled stages resident on the chip and serves concurrent requests with
continuous micro-batching.

TPU-native design decisions:
  * **Fixed device shapes.** Stage-3 dominates (a 1024-step compiled
    denoise scan); its device batch is pinned to ``rows_per_dispatch``
    (prompt×replica rows, padded by repetition) so every dispatch reuses
    one executable.  Stage-1/2 embed calls pad the prompt list the same
    way.
  * **Device dispatches are serialized** (`MicroBatcher` + a pipeline-level
    device lock): HTTP handler threads only enqueue and wait on futures,
    and the two dispatch threads (generate / embed) take the pipeline's
    ``_device_lock`` around every device call — an embed waits out an
    in-flight generate sample rather than dispatching concurrently with
    it (tunnel runtimes kill single executions whose wall-clock stretches
    past ~60 s; concurrent dispatch would stretch them).
  * **Row-level packing.** Requests with different prompts pack into one
    Stage-3 batch as independent rows (each row carries its own z_c and
    its own decode permutation — `pipeline/stage3.py:sample_batch`), so a
    single replica request doesn't waste the other rows: occupancy shows
    in `/v1/metrics`.

Endpoints (stdlib ``http.server``; JSON in/out):
  * ``POST /v1/generate`` ``{"prompt": str | "prompts": [str],
    "num_replicas": int?}`` → per-prompt designed sequences.
  * ``POST /v1/inpaint`` ``{"prompt": str, "sequence": str,
    "num_replicas": int?, "unknown": str?}`` → the sequence with every
    ``unknown`` character (default ``"?"``) filled, conditioned on the
    prompt; known residues and length are preserved.
  * ``POST /v1/embed`` ``{"prompts": [str]}`` → z_t, z_c.
  * ``POST /v1/profile`` ``{"seconds": float, "log_dir": str?}`` →
    captures a ``jax.profiler`` trace of whatever the daemon dispatches
    during that window (view in TensorBoard/XProf); one at a time.
  * ``GET /healthz`` → liveness + device platform.
  * ``GET /v1/metrics`` → batcher counters (occupancy, latency).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from biom3_tpu.serving.batcher import MicroBatcher


class ServingPipeline:
    """Wraps the three stage engines with fixed-shape batched entrypoints."""

    def __init__(
        self,
        stage1_engine,
        stage2_engine,
        stage3_engine,
        *,
        rows_per_dispatch: int = 16,
        default_replicas: int = 2,
        max_replicas: int = 64,
        seed: int = 0,
        mesh=None,
        interpret: bool = False,
        embed_cache: int = 4096,
    ):
        self.s1 = stage1_engine
        self.s2 = stage2_engine
        self.s3 = stage3_engine
        # multi-chip serving: Stage-3 rows spread over the mesh's (dp,
        # fsdp) batch axes — one whole-stack kernel per device shard,
        # params replicated, linear scale-out by construction
        if mesh is not None:
            shards = mesh.shape["dp"] * mesh.shape["fsdp"]
            if rows_per_dispatch % shards:
                raise ValueError(
                    f"rows_per_dispatch={rows_per_dispatch} must be a "
                    f"multiple of the mesh's dp*fsdp={shards}"
                )
            self._sample_rows = stage3_engine.make_sharded_sampler(
                mesh, interpret=interpret
            )
        else:
            self._sample_rows = stage3_engine.sample_batch
        # the inpaint backend builds lazily on first use (only the inpaint
        # batcher's single dispatcher thread touches it, so no lock): a
        # deployment that never inpaints pays nothing for it
        self._mesh = mesh
        self._interpret = interpret
        self._inpaint_rows = None
        self.rows_per_dispatch = rows_per_dispatch
        self.default_replicas = default_replicas
        self.max_replicas = max_replicas
        self.seed = seed
        self._key = jax.random.key(seed)
        self._key_lock = threading.Lock()
        self._batch_counter = 0
        # device-level packing counters: the batcher's occupancy counts
        # REQUESTS per coalescing window; these count ROWS per fixed-shape
        # dispatch (the number that tells an operator whether
        # rows_per_dispatch / max_wait_s are tuned right)
        self._dev_lock = threading.Lock()
        self._dispatches = 0
        self._rows_live = 0
        self._rows_padded = 0
        # serializes device calls across the generate- and embed-batcher
        # threads (see module docstring); held per device call (one embed
        # batch / one sample batch), not across a whole generate request
        self._device_lock = threading.Lock()
        # prompt → (z_t row, z_c row) LRU: serving workloads repeat
        # prompts (every replica batch, retries, templated requests);
        # a hit skips the BERT tower + facilitator dispatch entirely.
        # ~2.5 KB/entry at the reference dims; embed_cache=0 disables.
        from collections import OrderedDict

        self._embed_cache_cap = int(embed_cache)
        self._embed_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self._cache_hits = 0
        self._cache_misses = 0

    def _next_key(self) -> jax.Array:
        with self._key_lock:
            self._batch_counter += 1
            return jax.random.fold_in(self._key, self._batch_counter)

    def _record_dispatch(self, live_rows: int) -> None:
        """Account one fixed-shape device dispatch carrying ``live_rows``
        useful rows (both the packed and the continuous schedulers report
        here, so ``/v1/metrics``'s ``device.row_occupancy`` always means
        the same thing)."""
        with self._dev_lock:
            self._dispatches += 1
            self._rows_live += live_rows
            self._rows_padded += self.rows_per_dispatch - live_rows

    def embed(self, prompts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """prompts → (z_t, z_c); repeated prompts (within the batch or
        across requests) come from the LRU cache, the rest run padded to
        a fixed device batch.  Cached rows are the same f32 values the
        towers produced, so results are bit-identical with or without
        the cache."""
        n = len(prompts)
        if n == 0:
            raise ValueError("embed() needs at least one prompt")
        rows: dict[str, tuple] = {}
        if self._embed_cache_cap:
            with self._cache_lock:
                for p in set(prompts):
                    hit = self._embed_cache.get(p)
                    if hit is not None:
                        self._embed_cache.move_to_end(p)
                        rows[p] = hit
                self._cache_hits += sum(
                    1 for p in prompts if p in rows
                )
        # unique misses, first-seen order (also dedups within the batch)
        misses = [p for p in dict.fromkeys(prompts) if p not in rows]
        if misses:
            if self._embed_cache_cap:
                with self._cache_lock:
                    self._cache_misses += sum(
                        1 for p in prompts if p not in rows
                    )
            padded = misses + [misses[-1]] * (
                -len(misses) % self.rows_per_dispatch
            )
            with self._device_lock:
                z_t = self.s1.embed_text(
                    padded, batch_size=self.rows_per_dispatch
                )
                z_c = np.asarray(self.s2(z_t))
            z_t = np.asarray(z_t)
            for i, p in enumerate(misses):
                rows[p] = (z_t[i], z_c[i])
            if self._embed_cache_cap:
                with self._cache_lock:
                    for p in misses:
                        self._embed_cache[p] = rows[p]
                        self._embed_cache.move_to_end(p)
                    while len(self._embed_cache) > self._embed_cache_cap:
                        self._embed_cache.popitem(last=False)
        z_t_out = np.stack([rows[p][0] for p in prompts])
        z_c_out = np.stack([rows[p][1] for p in prompts])
        return z_t_out, z_c_out

    def embed_cache_stats(self) -> dict:
        with self._cache_lock:
            return {
                "capacity": self._embed_cache_cap,
                "size": len(self._embed_cache),
                "hits": self._cache_hits,
                "misses": self._cache_misses,
            }

    def embed_rows_device(self, prompts: list[str]):
        """prompts → DEVICE z_c (n, C): one async enqueue chain (tower,
        projection, facilitator back-to-back) with no host round-trip —
        unlike ``embed()``, which fetches z_t to host, re-uploads it to
        Stage-2 and fetches z_c.

        NOT used by the shipped schedulers: every async-admission-embed
        variant built on this measured WORSE on chip than the
        synchronous ``embed()`` (the r5 A/B ladder in
        ``serving/trajectory.py``'s docstring — flight pipelining
        starves admission, per-row device slices cost more tunnel ops
        than the fetch they save).  Kept (bit-parity-tested against
        ``embed()``) for library callers who want a device-resident z_c
        without the fetch, e.g. to feed another on-device computation.
        """
        import jax.numpy as jnp

        n = len(prompts)
        if n == 0:
            raise ValueError("embed_rows_device() needs >= one prompt")
        padded = prompts + [prompts[-1]] * (-n % self.rows_per_dispatch)
        ids = jnp.asarray(
            self.s1.text_tokenizer.batch_encode(padded)["input_ids"]
        )
        with self._device_lock:
            if getattr(self.s1, "_stack_arrays", None) is not None:
                z_t = self.s1._embed_text_fused(ids)
            else:
                z_t = self.s1._encode_text(self.s1.params, ids)
            z_c = self.s2(z_t.astype(jnp.float32))
        return z_c[:n]

    def _run_rows_packed(self, requests: list[dict], row_fn) -> list[dict]:
        """Pack (request, replica) rows into fixed ``rows_per_dispatch``
        device batches and run ``row_fn(request_indices, key) → (R, L)
        ids``; returns one ``{"prompt", "sequences"}`` dict per request.

        Unseeded requests pack together (throughput path; tokens depend on
        the whole batch's RNG stream, so results vary run to run).  A
        request carrying ``"seed"`` gets its OWN padded dispatch with
        ``key(seed)`` — same inputs/seed/replicas/engine config reproduces
        the sequences bit-exactly, at the cost of that dispatch's
        occupancy (visible in ``device_stats``).
        """
        rows = []  # (request_index, replica_index)
        for i, r in enumerate(requests):
            if r.get("seed") is not None:
                continue
            for k in range(int(r.get("num_replicas") or self.default_replicas)):
                rows.append((i, k))
        sequences: dict[tuple[int, int], str] = {}
        R = self.rows_per_dispatch

        def dispatch(chunk: list[tuple[int, int]], key) -> None:
            idx = [i for i, _ in chunk]
            # pad by repeating the last row: same executable every dispatch
            pad_idx = idx + [idx[-1]] * (R - len(idx))
            self._record_dispatch(len(chunk))
            with self._device_lock:
                ids = row_fn(pad_idx, key)
            for row, (i, k) in enumerate(chunk):
                sequences[(i, k)] = self.s3.vocab.clean_sequence(
                    self.s3.vocab.decode_ids(ids[row])
                )

        for start in range(0, len(rows), R):
            dispatch(rows[start : start + R], self._next_key())
        for i, r in enumerate(requests):
            if r.get("seed") is None:
                continue
            n_rep = int(r.get("num_replicas") or self.default_replicas)
            chunk = [(i, k) for k in range(n_rep)]
            base = jax.random.key(int(r["seed"]))
            for start in range(0, n_rep, R):
                dispatch(chunk[start : start + R],
                         base if start == 0
                         else jax.random.fold_in(base, start))

        out = []
        for i, r in enumerate(requests):
            n_rep = int(r.get("num_replicas") or self.default_replicas)
            out.append({
                "prompt": r["prompt"],
                "sequences": [sequences[(i, k)] for k in range(n_rep)],
            })
        return out

    def generate(self, requests: list[dict]) -> list[dict]:
        """Batch entrypoint: each request is ``{"prompt": str,
        "num_replicas": int, "seed": int?}``; returns one dict per request
        (packing/seeding semantics in ``_run_rows_packed``)."""
        prompts = [r["prompt"] for r in requests]
        z_t, z_c = self.embed(prompts)
        return self._run_rows_packed(
            requests, lambda idx, key: self._sample_rows(z_c[idx], key)
        )

    def _get_inpaint_rows(self):
        if self._inpaint_rows is None:
            if self._mesh is not None:
                self._inpaint_rows = self.s3.make_sharded_inpainter(
                    self._mesh, interpret=self._interpret
                )
            else:
                self._inpaint_rows = self.s3.inpaint_batch
        return self._inpaint_rows

    def warmup(self, *, include_inpaint: bool = True,
               include_generate: bool = True) -> dict:
        """Compile every serving executable with one padded dummy dispatch
        per endpoint BEFORE accepting traffic — otherwise the first
        client's latency includes the sampler's compile (minutes through
        some runtimes).  Returns per-executable wall-clock (dominated by
        compiles; steady-state dispatches are orders faster).

        ``include_generate=False`` skips the packed trajectory sampler —
        a continuous-mode server never dispatches it (the chunk stepper
        is its generate executable; ``BioM3Server.warmup`` compiles that
        one instead), so compiling both would double startup time and
        HBM executable footprint for nothing."""
        import time

        times = {}
        t0 = time.time()
        _, z_c = self.embed(["warmup prompt"])
        times["embed_s"] = round(time.time() - t0, 1)
        zpad = np.repeat(
            np.asarray(z_c[:1], np.float32), self.rows_per_dispatch, axis=0
        )
        if include_generate:
            t0 = time.time()
            with self._device_lock:
                self._sample_rows(zpad, self._next_key())
            times["generate_s"] = round(time.time() - t0, 1)
        if include_inpaint:
            L = self.s3.config.max_seq_len
            masked = np.repeat(
                self.s3.vocab.encode_partial("?", L)[None, :],
                self.rows_per_dispatch, axis=0,
            )
            inpaint_rows = self._get_inpaint_rows()
            t0 = time.time()
            with self._device_lock:
                inpaint_rows(masked, zpad, self._next_key())
            times["inpaint_s"] = round(time.time() - t0, 1)
        return times

    def inpaint(self, requests: list[dict]) -> list[dict]:
        """Fill user-masked residues conditioned on the text prompt.

        Each request is ``{"prompt": str, "sequence": str,
        "num_replicas": int?, "seed": int?, "unknown": str?}`` — the
        sequence fixes the design's length and committed residues;
        every ``unknown`` character (default ``"?"``) is generated.
        Serving port of the reference's corrupt/autocomplete analysis
        surface (``Stage3_source/sampling_analysis.py:21-119``); rides
        the engine's compiled inpainter (``ProteoScribeEngine.
        inpaint_batch``, or its shard_map twin under a mesh) — rows pack
        exactly like ``generate``.
        """
        inpaint_rows = self._get_inpaint_rows()
        prompts = [r["prompt"] for r in requests]
        z_t, z_c = self.embed(prompts)
        L = self.s3.config.max_seq_len
        masked = np.stack([
            # the HTTP handler pre-encodes for validation and forwards the
            # row as "masked_ids"; encode here only for direct library use
            np.asarray(r["masked_ids"], np.int32)
            if r.get("masked_ids") is not None
            else self.s3.vocab.encode_partial(
                r["sequence"], L, r.get("unknown") or "?"
            )
            for r in requests
        ])
        return self._run_rows_packed(
            requests,
            lambda idx, key: inpaint_rows(masked[idx], z_c[idx], key),
        )

    def device_stats(self) -> dict:
        with self._dev_lock:
            total = self._rows_live + self._rows_padded
            return {
                "dispatches": self._dispatches,
                "rows_live": self._rows_live,
                "rows_padded": self._rows_padded,
                "row_occupancy": (
                    round(self._rows_live / total, 3) if total else 0.0
                ),
            }


class BioM3Server:
    """HTTP front-end with continuous micro-batching over ServingPipeline."""

    def __init__(
        self,
        pipeline: ServingPipeline,
        *,
        host: str = "127.0.0.1",
        port: int = 8000,
        max_wait_s: float = 0.05,
        request_timeout_s: float = 600.0,
        continuous: bool | None = None,
        continuous_inpaint: bool = False,
        packed_scheduler: str = "trajectory",
    ):
        self.pipeline = pipeline
        self.request_timeout_s = request_timeout_s
        # generate dominates; embeds ride a separate (cheap) batcher so a
        # long denoise batch never blocks embedding-only clients.
        # ``continuous=None`` auto-selects: exact path-order ARDM gets the
        # chunk-boundary continuous scheduler (rows join/retire at every
        # 128-step chunk boundary — round 3 measured 0.52 row occupancy
        # under load with trajectory-start packing); fast modes
        # (maskgit / confidence order) finish in ~16 forwards with no
        # useful intra-trajectory boundaries — they get the row-granular
        # depth-1-pipelined TrajectoryBatcher (round 5; ``packed_
        # scheduler="micro"`` keeps the request-granular MicroBatcher
        # for A/Bs).
        if packed_scheduler not in ("trajectory", "micro"):
            raise ValueError(f"packed_scheduler must be 'trajectory' or "
                             f"'micro', got {packed_scheduler!r}")
        self.packed_scheduler = packed_scheduler
        if continuous is None:
            continuous = pipeline.s3.supports_continuous_stepping()
        self.continuous = bool(continuous)
        if self.continuous:
            from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

            self._gen_batcher = ContinuousGenerateBatcher(pipeline)
        elif packed_scheduler == "trajectory":
            from biom3_tpu.serving.trajectory import TrajectoryBatcher

            self._gen_batcher = TrajectoryBatcher(
                pipeline, max_wait_s=max_wait_s
            )
        else:
            self._gen_batcher = MicroBatcher(
                pipeline.generate,
                max_batch=pipeline.rows_per_dispatch,
                max_wait_s=max_wait_s,
                name="generate-batcher",
            )
        self._embed_batcher = MicroBatcher(
            self._run_embed_batch,
            max_batch=pipeline.rows_per_dispatch,
            max_wait_s=max_wait_s,
            name="embed-batcher",
        )
        # inpaint default: the packed confidence-order inpainter (easy-
        # first ordering dominates random order in every certified cell —
        # PARITY.md — and early-exits at one step per masked position).
        # ``continuous_inpaint=True`` routes inpaint requests through the
        # continuous scheduler instead: reference random-order resume
        # semantics, rows sharing chunk dispatches with generate traffic
        # (throughput under mixed load at the cost of the easy-first
        # ordering).
        if continuous_inpaint and not self.continuous:
            raise ValueError(
                "continuous_inpaint requires the continuous generate "
                "scheduler (exact path-order ARDM engine + continuous "
                "not disabled); this engine/server combination would "
                "silently fall back to the packed inpainter"
            )
        self.continuous_inpaint = bool(continuous_inpaint)
        if self.continuous_inpaint:
            self._inpaint_batcher = self._gen_batcher
        elif getattr(self._gen_batcher, "accepts_masked", False):
            # maskgit trajectory scheduler: inpaint resumes the SAME
            # compiled executable as generate (x0 = partial vs all-
            # absorbing), so inpaint rows share generate dispatches —
            # one scheduler, mixed-traffic occupancy for free
            self._inpaint_batcher = self._gen_batcher
        else:
            self._inpaint_batcher = MicroBatcher(
                pipeline.inpaint,
                max_batch=pipeline.rows_per_dispatch,
                max_wait_s=max_wait_s,
                name="inpaint-batcher",
            )
        # jax.profiler trace capture is process-global: one window at a time
        self._profile_lock = threading.Lock()
        handler = self._make_handler()
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._serve_thread: threading.Thread | None = None

    def _run_embed_batch(self, prompts: list[str]) -> list[dict]:
        z_t, z_c = self.pipeline.embed(prompts)
        return [
            {"z_t": z_t[i].tolist(), "z_c": z_c[i].tolist()}
            for i in range(len(prompts))
        ]

    # -- lifecycle -----------------------------------------------------

    def warmup(self, *, include_inpaint: bool = True) -> dict:
        """Compile the executables THIS server will actually dispatch (see
        ``ServingPipeline.warmup``): in continuous mode the generate path
        is the chunk stepper, in trajectory mode the row-fn dispatch;
        the packed trajectory sampler is then never compiled.  When
        inpaint rows ride the generate scheduler (continuous_inpaint, or
        the maskgit trajectory merge) the packed inpainter isn't compiled
        either."""
        inpaint_merged = self._inpaint_batcher is self._gen_batcher
        own_warmup = hasattr(self._gen_batcher, "warmup")
        times = self.pipeline.warmup(
            include_inpaint=include_inpaint and not inpaint_merged,
            include_generate=not own_warmup,
        )
        if own_warmup:
            label = ("generate_chunk_s" if self.continuous
                     else "generate_trajectory_s")
            times[label] = self._gen_batcher.warmup()
        return times

    def start(self) -> None:
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, name="biom3-http", daemon=True
        )
        self._serve_thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        self._gen_batcher.close()
        self._embed_batcher.close()
        if self._inpaint_batcher is not self._gen_batcher:
            self._inpaint_batcher.close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=10)

    # -- HTTP plumbing ---------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet: per-request stderr logging is useless under load
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (http.server API)
                if self.path == "/healthz":
                    self._reply(200, {
                        "status": "ok",
                        "platform": jax.devices()[0].platform,
                        "rows_per_dispatch":
                            server.pipeline.rows_per_dispatch,
                        "continuous": server.continuous,
                        "continuous_inpaint": server.continuous_inpaint,
                    })
                elif self.path == "/v1/metrics":
                    from biom3_tpu.utils.profiling import (
                        device_memory_stats,
                        host_memory_mb,
                    )

                    gen_mode = (
                        "continuous" if server.continuous
                        else server.packed_scheduler
                    )
                    self._reply(200, {
                        "generate_mode": gen_mode,
                        "inpaint_mode": (
                            "continuous" if server.continuous_inpaint
                            else gen_mode
                            if server._inpaint_batcher
                            is server._gen_batcher
                            else "packed"
                        ),
                        "generate": server._gen_batcher.stats.as_dict(),
                        # aliased batchers share ONE stats object; a
                        # duplicate copy here would read as independent
                        # per-endpoint counters (they are combined)
                        "inpaint": (
                            {"merged_into_generate": True}
                            if server._inpaint_batcher
                            is server._gen_batcher
                            else server._inpaint_batcher.stats.as_dict()
                        ),
                        "embed": server._embed_batcher.stats.as_dict(),
                        "embed_cache":
                            server.pipeline.embed_cache_stats(),
                        "device": server.pipeline.device_stats(),
                        # operator memory view (the reference's pynvml/
                        # psutil probes, SURVEY.md component 7, as live
                        # serving telemetry): HBM MB + host RSS MB
                        "memory": {
                            "hbm_mb": {
                                k: round(v, 1)
                                for k, v in device_memory_stats().items()
                                if k in ("bytes_in_use", "peak_bytes_in_use",
                                         "bytes_limit")
                            },
                            "host_rss_mb": round(host_memory_mb(), 1),
                        },
                    })
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def _read_json(self) -> dict:
                length = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(length) or b"{}")

            def do_POST(self):  # noqa: N802
                try:
                    req = self._read_json()
                except json.JSONDecodeError as exc:
                    self._reply(400, {"error": f"bad json: {exc}"})
                    return
                if not isinstance(req, dict):
                    self._reply(400, {"error": "body must be a JSON object"})
                    return
                try:
                    if self.path == "/v1/generate":
                        self._generate(req)
                    elif self.path == "/v1/inpaint":
                        self._inpaint(req)
                    elif self.path == "/v1/embed":
                        self._embed(req)
                    elif self.path == "/v1/profile":
                        self._profile(req)
                    else:
                        self._reply(404, {"error": f"no route {self.path}"})
                except Exception as exc:  # noqa: BLE001 — HTTP boundary
                    self._reply(500, {"error": str(exc)})

            def _generate(self, req: dict) -> None:
                prompts = req.get("prompts")
                if prompts is None:
                    if "prompt" not in req:
                        self._reply(400, {"error": "need prompt or prompts"})
                        return
                    prompts = [req["prompt"]]
                # require a real list: a bare string would pass an
                # all(isinstance(p, str)) check per CHARACTER and fan out
                # one pipeline per character
                if not isinstance(prompts, list) or not prompts or not all(
                    isinstance(p, str) and p.strip() for p in prompts
                ):
                    self._reply(400, {"error": "prompts must be a non-empty "
                                               "list of non-empty strings"})
                    return
                ok, n_rep, seed = self._rep_seed(req)
                if not ok:
                    return
                futures = [
                    server._gen_batcher.submit(
                        {"prompt": p, "num_replicas": n_rep, "seed": seed}
                    )
                    for p in prompts
                ]
                results = [
                    f.result(timeout=server.request_timeout_s)
                    for f in futures
                ]
                self._reply(200, {"results": results})

            def _rep_seed(self, req: dict):
                """Validate num_replicas/seed; replies 400 and returns
                (False, ..) on failure."""
                n_rep = req.get("num_replicas")
                cap = server.pipeline.max_replicas
                if n_rep is not None and (
                    not isinstance(n_rep, int) or isinstance(n_rep, bool)
                    or not 1 <= n_rep <= cap
                ):
                    self._reply(400, {
                        "error": f"num_replicas must be an int in "
                                 f"[1, {cap}], got {n_rep!r}"
                    })
                    return False, None, None
                seed = req.get("seed")
                if seed is not None and (
                    not isinstance(seed, int) or isinstance(seed, bool)
                    or not 0 <= seed < 2**32
                ):
                    self._reply(400, {
                        "error": f"seed must be an int in [0, 2^32), "
                                 f"got {seed!r}"
                    })
                    return False, None, None
                return True, n_rep, seed

            def _inpaint(self, req: dict) -> None:
                prompt = req.get("prompt")
                if not isinstance(prompt, str) or not prompt.strip():
                    self._reply(400, {"error": "prompt must be a non-empty "
                                               "string"})
                    return
                sequence = req.get("sequence")
                if not isinstance(sequence, str) or not sequence:
                    self._reply(400, {"error": "sequence must be a "
                                               "non-empty string"})
                    return
                unknown = req.get("unknown")
                if unknown is not None and (
                    not isinstance(unknown, str) or len(unknown) != 1
                ):
                    self._reply(400, {"error": "unknown must be a single "
                                               "character"})
                    return
                ok, n_rep, seed = self._rep_seed(req)
                if not ok:
                    return
                # encode on the handler thread: a bad sequence must 400
                # here, not poison a co-batched dispatch — and the encoded
                # row rides the payload so the batcher doesn't redo it
                try:
                    masked_ids = server.pipeline.s3.vocab.encode_partial(
                        sequence,
                        server.pipeline.s3.config.max_seq_len,
                        unknown or "?",
                    )
                except ValueError as exc:
                    self._reply(400, {"error": str(exc)})
                    return
                fut = server._inpaint_batcher.submit({
                    "prompt": prompt, "sequence": sequence,
                    "num_replicas": n_rep, "seed": seed,
                    "unknown": unknown or "?",
                    "masked_ids": masked_ids,
                })
                result = fut.result(timeout=server.request_timeout_s)
                self._reply(200, {"results": [result]})

            def _profile(self, req: dict) -> None:
                """Trace the daemon's device activity for a bounded window
                (the serving twin of ``utils/profiling.profile_trace``)."""
                seconds = req.get("seconds", 5)
                if (not isinstance(seconds, (int, float))
                        or isinstance(seconds, bool)
                        or not 0 < seconds <= 60):
                    self._reply(400, {"error": "seconds must be a number "
                                               "in (0, 60]"})
                    return
                log_dir = req.get("log_dir")
                if log_dir is not None and not isinstance(log_dir, str):
                    self._reply(400, {"error": "log_dir must be a string"})
                    return
                if not server._profile_lock.acquire(blocking=False):
                    self._reply(409, {"error": "a profile capture is "
                                               "already running"})
                    return
                try:
                    import tempfile
                    import time as _time

                    import jax.profiler

                    log_dir = log_dir or tempfile.mkdtemp(
                        prefix="biom3_profile_"
                    )
                    jax.profiler.start_trace(log_dir)
                    _time.sleep(float(seconds))
                    jax.profiler.stop_trace()
                finally:
                    server._profile_lock.release()
                self._reply(200, {"log_dir": log_dir,
                                  "seconds": float(seconds)})

            def _embed(self, req: dict) -> None:
                prompts = req.get("prompts")
                if prompts is None and "prompt" in req:
                    prompts = [req["prompt"]]
                # same bare-string guard as _generate
                if not isinstance(prompts, list) or not prompts or not all(
                    isinstance(p, str) and p.strip() for p in prompts
                ):
                    self._reply(400, {"error": "prompts must be a non-empty "
                                               "list of non-empty strings"})
                    return
                futures = [
                    server._embed_batcher.submit(p) for p in prompts
                ]
                results = [
                    f.result(timeout=server.request_timeout_s)
                    for f in futures
                ]
                self._reply(200, {"results": results})

        return Handler
