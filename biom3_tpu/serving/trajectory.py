"""Row-granular packed scheduling for trajectory-complete samplers.

Round-4 measurement (`outputs/chip_session_logs/r4_serving_maskgit_r32x4.log`):
MaskGIT serving ran at 45.1 seqs/s — 49% of its own 92 seqs/s offline
rate — through the request-granular ``MicroBatcher``.  The gap was pure
scheduling: every dispatch paid the ~0.2 s tunnel round-trip serially
(fetch → decode → embed → next dispatch), and request-granular chunking
quantized occupancy to whole requests (0.79 row occupancy).

This scheduler applies the continuous scheduler's own medicine
(``serving/continuous.py``) to fast modes whose trajectories have no
useful intra-trajectory admission boundaries (MaskGIT ≈ 16 forwards,
blocked-confidence ≈ L/k forwards):

  * **row granularity** — (request, replica) rows pack across request
    boundaries into fixed ``rows_per_dispatch`` batches, so a partial
    request's leftover rows ride the next dispatch instead of padding;
  * **depth-1 dispatch pipelining** — dispatch N+1 is enqueued (async,
    ``pipeline/stage3.make_trajectory_row_fn``) BEFORE dispatch N's
    results are fetched: the round-trip and the host-side decode hide
    under device execution;
  * **adaptive coalescing** — a partial batch waits for stragglers only
    while the wait is free (a dispatch in flight keeps the device busy;
    the window stretches toward the measured dispatch time), and never
    when the batch is already full;
  * **maskgit generate+inpaint merging** — both resume the SAME compiled
    executable (generate = inpaint from x0 = all-absorbing), so inpaint
    rows share dispatches with generate traffic exactly like the
    continuous scheduler's exact-mode inpaint rows.

Seeded requests keep the packed path's contract: a solo padded dispatch
keyed on ``key(seed)`` — bit-exact reproduction under any traffic, at a
measurable occupancy cost (`/v1/metrics` ``device.row_occupancy``).

Reference counterpart: none — the reference's sampling surface is the
offline loop ``Stage3_source/sampling_analysis.py:204-265`` behind the
one-shot ``run_ProteoScribe_sample.py`` CLI.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future

import jax
import numpy as np

from biom3_tpu.serving.batcher import BatcherStats


class TrajectoryBatcher:
    """Drop-in for ``MicroBatcher(pipeline.generate, ...)`` /
    ``MicroBatcher(pipeline.inpaint, ...)``: same ``submit(request) →
    Future`` / ``stats`` / ``close()`` surface, but scheduling
    (request, replica) rows into fixed-shape whole-trajectory dispatches
    with depth-1 pipelining.

    ``submit`` takes the HTTP handler's request dicts (``{"prompt",
    "num_replicas", "seed"}``, plus ``"masked_ids"`` for inpaint rows
    when the engine is in maskgit mode) and resolves the future with the
    same ``{"prompt", "sequences"}`` payload as ``ServingPipeline``'s
    ``generate`` / ``inpaint``.
    """

    def __init__(self, pipeline, *, max_wait_s: float = 0.02,
                 name: str = "generate-trajectory"):
        self.pipeline = pipeline
        self._row_fn, self.accepts_masked = (
            pipeline.s3.make_trajectory_row_fn(
                mesh=pipeline._mesh, interpret=pipeline._interpret
            )
        )
        self._vocab = pipeline.s3.vocab
        self.R = pipeline.rows_per_dispatch
        self.L = pipeline.s3.config.max_seq_len
        self.max_wait_s = max_wait_s
        self._pending: deque[dict] = deque()
        self._cv = threading.Condition()
        # unresolved submitted groups (close()'s race-free drain signal:
        # _pending empties BEFORE the dispatch is in flight, so polling
        # the queues directly can see "drained" mid-dispatch)
        self._outstanding = 0
        self._closed = False
        self._closing = False
        self.stats = BatcherStats()
        # EMA of dispatch wall-clock (enqueue → fetch complete): the free
        # coalescing budget while a dispatch is in flight
        self._ema_dispatch_s = 0.0
        self._thread = threading.Thread(
            target=self._loop, name=name, daemon=True
        )
        self._thread.start()

    # -- client surface ------------------------------------------------

    def submit(self, request: dict) -> Future:
        fut: Future = Future()
        n_rep = int(
            request.get("num_replicas") or self.pipeline.default_replicas
        )
        mids = request.get("masked_ids")
        if mids is not None:
            if not self.accepts_masked:
                raise ValueError(
                    "this engine's trajectory scheduler cannot carry "
                    "inpaint rows (ardm fast modes use a separate "
                    "inpaint executable)"
                )
            if not (np.asarray(mids) == 0).any():
                # nothing to fill: resolve without consuming rows
                with self._cv:
                    if self._closed or self._closing:
                        raise RuntimeError("batcher is closed")
                    with self.stats._lock:
                        self.stats.requests += 1
                seq = self._vocab.clean_sequence(
                    self._vocab.decode_ids(np.asarray(mids, np.int32))
                )
                fut.set_result({
                    "prompt": request["prompt"], "sequences": [seq] * n_rep,
                })
                return fut
        group = {
            "request": request,
            "future": fut,
            "n_rep": n_rep,
            "next_rep": 0,
            "remaining": n_rep,
            "z_c": None,
            "sequences": {},
        }
        with self._cv:
            if self._closed or self._closing:
                raise RuntimeError("batcher is closed")
            with self.stats._lock:
                self.stats.requests += 1
            self._pending.append(group)
            self._outstanding += 1
            self._cv.notify_all()
        return fut

    def warmup(self) -> float:
        """Compile the trajectory executable with one padded dummy
        dispatch (stats untouched); returns wall-clock seconds."""
        t0 = time.time()
        C = self.pipeline.s3.config.cond_dim
        zc = np.zeros((self.R, C), np.float32)
        with self.pipeline._device_lock:
            ids = self._row_fn(zc, jax.random.key(0))
        np.asarray(ids)
        return round(time.time() - t0, 1)

    def close(self, timeout: float = 30.0, drain_s: float = 120.0) -> None:
        """Draining shutdown (same contract as the continuous batcher):
        refuse new submissions, let queued and in-flight rows finish
        (bounded by ``drain_s``), then stop and fail any stragglers."""
        with self._cv:
            self._closing = True
            self._cv.notify_all()
        deadline = time.monotonic() + drain_s
        while time.monotonic() < deadline:
            with self._cv:
                if self._outstanding == 0:
                    break
            time.sleep(0.25)
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=timeout)
        self._fail_groups(
            None, RuntimeError("batcher is closed"), count_errors=False
        )

    # -- scheduler -----------------------------------------------------

    def _in_flight(self) -> bool:
        return getattr(self, "_flight", None) is not None

    def _loop(self) -> None:
        self._flight = None  # (rows, ids_dev, t_enqueue) awaiting fetch
        while True:
            with self._cv:
                while (not self._closed and not self._pending
                       and self._flight is None):
                    self._cv.wait(timeout=0.1)
                if self._closed:
                    return
            try:
                self._embed_pending()
                dispatched = self._dispatch_next()
                if not dispatched and self._flight is not None:
                    self._collect()
            except Exception as exc:  # noqa: BLE001 — fail fast: an
                # unexpected scheduler error must reach the waiting
                # clients, not strand their futures until the HTTP timeout
                self._fail_groups(None, exc)

    def _embed_pending(self) -> None:
        """One padded embed call for every queued group still lacking
        z_c; with a dispatch in flight, its device work queues behind
        the executing trajectory.  A failure fails ONLY the groups whose
        embed it was.

        Deliberately SYNCHRONOUS (``pipeline.embed``): three async
        variants were measured on chip and all lost to this
        (r5 sessions C-H, 16 clients × 4 replicas maskgit): sync 61.4 →
        **70.0 seqs/s with the 2× coalescing window**
        (`r5_serving_maskgit_traj`, `..._final3`); fused one-fetch
        device embed 41.3 (`..._v2`); one-deep pipelined embed flights
        39-42 (`..._v3*`); lazy-resolved flights 13.8 with p95 blowups
        (`..._v4`); legacy request-granular control 54.8
        (`..._micro_ctl`).  The flight variants starve admission —
        rows arrive one dispatch late, the coalescing window then fires
        on nearly every dispatch — and eager per-row device slicing
        costs more tunnel ops than the round-trip it saves."""
        with self._cv:
            need = [g for g in self._pending if g["z_c"] is None][: self.R]
        if not need:
            return
        try:
            _, z_c = self.pipeline.embed(
                [g["request"]["prompt"] for g in need]
            )
        except Exception as exc:  # noqa: BLE001 — forwarded per group
            self._fail_groups(need, exc)
            return
        for i, g in enumerate(need):
            g["z_c"] = z_c[i]

    def _ready_rows(self):
        """(group, replica) rows dispatchable right now, FIFO, stopping
        at the first seeded group (seeded rows need a solo dispatch — it
        is returned separately when it heads the queue) or the first
        group still awaiting its embed."""
        rows = []
        seeded = None
        for g in self._pending:
            if g["z_c"] is None:
                break
            if g["request"].get("seed") is not None:
                if not rows:
                    seeded = g
                break
            for rep in range(g["next_rep"], g["n_rep"]):
                rows.append((g, rep))
                if len(rows) >= self.R:
                    return rows, None
        return rows, seeded

    def _dispatch_next(self) -> bool:
        """Build and enqueue at most one dispatch; returns True if one
        was enqueued.  Waits (adaptively) for stragglers only while the
        batch is partial AND the wait costs nothing."""
        with self._cv:
            rows, seeded = self._ready_rows()
        if not rows and seeded is None:
            return False
        if seeded is not None and not rows:
            return self._dispatch_seeded(seeded)
        if len(rows) < self.R:
            # Adaptive coalescing: with a dispatch in flight the device
            # stays busy while we wait; idle, only the base window.
            # Arrivals during the window are embedded HERE (their device
            # work queues behind the in-flight trajectory) so they can
            # actually join this dispatch.  TWO dispatch-times of
            # budget: the closed-loop refill chain after a retirement
            # (HTTP response -> client resubmit -> in-window admission
            # embed ~0.3 s) needs more than one dispatch-time to refill
            # 32 rows.  Measured ladder (16 clients x 4 replicas
            # maskgit): ~1 s window -> occupancy 1.00 / 61.4-70.0
            # seqs/s; 0.5x-EMA -> 0.80 / 55.4; 1x-EMA -> 0.80 / 38
            # (r5_serving_maskgit_traj* logs)
            window = self.max_wait_s
            if self._flight is not None:
                window = max(window, 2.0 * self._ema_dispatch_s)
            deadline = time.monotonic() + min(window, 1.0)
            while time.monotonic() < deadline:
                with self._cv:
                    rows, seeded = self._ready_rows()
                    if len(rows) >= self.R or self._closing:
                        break
                    need_embed = any(
                        g["z_c"] is None for g in self._pending
                    )
                    if not need_embed:
                        self._cv.wait(timeout=min(
                            0.005, max(deadline - time.monotonic(), 0.001)
                        ))
                if need_embed:
                    self._embed_pending()
            with self._cv:
                rows, seeded = self._ready_rows()
            if not rows:
                return (self._dispatch_seeded(seeded)
                        if seeded is not None else False)
        self._dispatch(rows[: self.R], self.pipeline._next_key())
        return True

    def _dispatch_seeded(self, group: dict) -> bool:
        """Solo padded dispatch(es) for a seeded group: key(seed) /
        fold_in per extra chunk — the packed path's reproducibility
        contract (bit-exact for fixed seed/replicas/engine config,
        independent of concurrent traffic)."""
        base = jax.random.key(int(group["request"]["seed"]))
        rows = [(group, rep)
                for rep in range(group["next_rep"], group["n_rep"])]
        for start in range(0, len(rows), self.R):
            key = base if start == 0 else jax.random.fold_in(base, start)
            # _dispatch collects the previous flight itself — chunks of a
            # large seeded group pipeline like any other dispatches
            self._dispatch(rows[start : start + self.R], key)
        return True

    def _dispatch(self, rows, key) -> None:
        """Enqueue one fixed-shape dispatch for ``rows``; fetch/decode of
        the PREVIOUS dispatch happens after, overlapping this one's
        execution."""
        zc = np.empty((self.R, len(rows[0][0]["z_c"])), np.float32)
        masked = None
        for i in range(self.R):
            g, _rep = rows[min(i, len(rows) - 1)]  # pad by repetition
            zc[i] = g["z_c"]
            mids = g["request"].get("masked_ids")
            if mids is not None:
                if masked is None:
                    masked = np.zeros((self.R, self.L), np.int32)
                masked[i] = np.asarray(mids, np.int32)
        with self._cv:
            for g, rep in rows:
                g["next_rep"] = max(g["next_rep"], rep + 1)
                if g["next_rep"] >= g["n_rep"] and g in self._pending:
                    self._pending.remove(g)
        t0 = time.monotonic()
        try:
            with self.pipeline._device_lock:
                ids_dev = self._row_fn(zc, key, masked)
            ids_dev.copy_to_host_async()
        except Exception as exc:  # noqa: BLE001 — this dispatch's rows
            self._fail_groups([g for g, _ in rows], exc)
            return
        self.pipeline._record_dispatch(len(rows))
        prev, self._flight = self._flight, (rows, ids_dev, t0)
        if prev is not None:
            self._collect(prev)

    def _collect(self, flight=None) -> None:
        """Fetch + decode one dispatch's results and resolve finished
        groups.  Called with the PREVIOUS flight right after enqueueing
        the next (pipelined), or with the current one when draining."""
        if flight is None:
            flight, self._flight = self._flight, None
        rows, ids_dev, t0 = flight
        try:
            ids = np.asarray(ids_dev)
        except Exception as exc:  # noqa: BLE001 — this dispatch's rows
            self._fail_groups([g for g, _ in rows], exc)
            return
        wall = time.monotonic() - t0
        if wall < 10.0:
            # pacing EMA; compile-length dispatches excluded — seeding
            # the EMA with a ~50 s first-request compile inflates the
            # partial-batch coalescing window for the next ~dozen
            # dispatches
            self._ema_dispatch_s = (
                wall if self._ema_dispatch_s == 0.0
                else 0.7 * self._ema_dispatch_s + 0.3 * wall
            )
        self.stats.record(len(rows), wall, False)
        for i, (g, rep) in enumerate(rows):
            seq = self._vocab.clean_sequence(
                self._vocab.decode_ids(ids[i])
            )
            with self._cv:
                g["sequences"][rep] = seq
                g["remaining"] -= 1
                done = g["remaining"] == 0 and not g.get("settled")
                if done:
                    g["settled"] = True
                    self._outstanding -= 1
            if done and not g["future"].done():
                g["future"].set_result({
                    "prompt": g["request"]["prompt"],
                    "sequences": [
                        g["sequences"][r] for r in range(g["n_rep"])
                    ],
                })

    def _fail_groups(self, groups, exc: BaseException, *,
                     count_errors: bool = True) -> None:
        """Fail ``groups`` (or, with ``groups=None``, every queued and
        in-flight group — the escalation / close-sweep path)."""
        with self._cv:
            if groups is None:
                found = {id(g): g for g in self._pending}
                if getattr(self, "_flight", None) is not None:
                    for g, _rep in self._flight[0]:
                        found[id(g)] = g
                    self._flight = None
                self._pending.clear()
                groups = list(found.values())
            else:
                seen = set()
                groups = [g for g in groups
                          if not (id(g) in seen or seen.add(id(g)))]
                for g in groups:
                    try:
                        self._pending.remove(g)
                    except ValueError:
                        pass
        with self._cv:
            unsettled = [g for g in groups if not g.get("settled")]
            for g in unsettled:
                g["settled"] = True
            self._outstanding -= len(unsettled)
        if count_errors and unsettled:
            with self.stats._lock:
                self.stats.errors += len(unsettled)
        for g in unsettled:
            if not g["future"].done():
                g["future"].set_exception(exc)
