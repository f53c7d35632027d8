"""Chunk-boundary continuous batching for exact-mode generation (and,
optionally, exact-mode inpainting — see ``submit``).

Round-3 measurement (BACKLOG.md "serving load scaling"): trajectory-start
packing served exact ARDM at 1.13 seqs/s with **0.52 row occupancy** under
a 16-client load — half of every dispatch was padding, because a request
arriving mid-trajectory had to wait out the whole 1024-step scan.  The
sampler already dispatched in 128-step chunks and the model already takes
per-row ``t``; this module exploits both:

  * the device half (``diffusion.sampler.make_chunk_stepper``) advances
    each row from its OWN step offset, so rows at different trajectory
    phases share one fixed-shape dispatch;
  * this scheduler admits queued (request, replica) rows into free slots
    and retires finished ones at EVERY chunk boundary (8 admission points
    per 1024-step trajectory at ``chunk_steps=128``), instead of only at
    trajectory start.

Under saturation every slot is live every chunk → occupancy ~1.0; the gap
to offline throughput collapses to per-dispatch overhead.  Per-row RNG
streams mean a seeded request reproduces bit-exactly in ANY batch mix —
the packed path's solo-dispatch-per-seed occupancy cost is gone too.

Reference counterpart: none — the reference's sampling surface is the
offline per-step host loop ``Stage3_source/sampling_analysis.py:204-265``.

Host/device split: the carries (``x`` decoding state, per-row RNG key
data) stay device-resident between chunks — ``x`` is fetched only on
retiring chunks, and the host pipelines one chunk deep so the dispatch
round-trip hides under execution.  Admissions upload only the small
per-row arrays (z_c, inv, fresh flags, x_new, key seeds, offsets) as
arguments of the chunk dispatch; the stepper injects fresh rows on
device.

Measured on-chip (r4 ladder, BACKLOG "Round 4 session 1"): row occupancy
0.52 → 0.85–0.97; at 64 rows in flight the daemon serves 96% of the
offline sampler rate.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future

import jax
import numpy as np

from biom3_tpu.serving.batcher import BatcherStats


class ContinuousGenerateBatcher:
    """Drop-in for ``MicroBatcher(pipeline.generate, ...)``: same
    ``submit(request) → Future`` / ``stats`` / ``close()`` surface, but
    scheduling (request, replica) rows onto persistent device slots at
    chunk boundaries.

    ``submit`` takes the same request dicts the HTTP handler builds
    (``{"prompt", "num_replicas", "seed"}``) and resolves the future with
    the same ``{"prompt", "sequences"}`` payload as
    ``ServingPipeline.generate``.
    """

    def __init__(self, pipeline, *, name: str = "generate-continuous"):
        self.pipeline = pipeline
        eng = pipeline.s3
        self._chunk_fn, meta = eng.make_continuous_stepper(
            mesh=pipeline._mesh, interpret=pipeline._interpret
        )
        self._params = meta["params"]
        self._sharding = meta["data_sharding"]
        self._num_steps = meta["num_steps"]
        self._step_incr = meta["chunk_steps"] * meta["positions_per_step"]
        self.chunk_steps = meta["chunk_steps"]
        self._vocab = eng.vocab
        R = pipeline.rows_per_dispatch
        L = eng.config.max_seq_len
        C = eng.config.cond_dim
        self.R, self.L = R, L
        # raw key-data width of the process's PRNG impl (threefry: 2
        # uint32 words), resolved without a device op
        self._kw = int(
            np.prod(
                jax.eval_shape(
                    lambda: jax.random.key_data(jax.random.key(0))
                ).shape
            )
        )
        self._zc = np.zeros((R, C), np.float32)
        self._inv = np.zeros((R, L), np.int32)
        self._t0 = np.full((R,), self._num_steps, np.int32)  # all inert
        # per-slot admission state, read by the stepper only where
        # ``fresh`` is set (stale rows ignored) — the LIVE x/key state is
        # the device-resident carry below, never fetched between
        # boundaries.  ``x_new`` is zeros for generate rows and the
        # partially revealed sequence for exact-mode inpaint rows.
        self._kd_new = np.zeros((R, self._kw), np.uint32)
        self._fresh = np.zeros((R,), bool)
        self._xnew = np.zeros((R, L), np.int32)
        self._x_dev = None   # device-resident decoding state
        self._kd_dev = None  # device-resident per-row RNG state
        self._slots: list[tuple[dict, int] | None] = [None] * R
        # unseeded rows draw their decode order + RNG stream from one
        # host generator seeded from the pipeline's --seed (like the
        # packed path's fold_in(key(seed), counter): run-to-run
        # deterministic for a fixed request arrival order, varying with
        # concurrency).  Request-pinned determinism is the "seed" field's
        # job (Philox keyed on (seed, replica) — _row_streams)
        self._host_rng = np.random.default_rng(
            [getattr(pipeline, "seed", 0), 0xC017],
        )
        # host/device sync policy per chunk (on-chip ladder, BACKLOG r4):
        #   depth1 (default) — wait on the PREVIOUS chunk after dispatching
        #     the next one: round-trip hides under execution, admissions
        #     lag <= 1 boundary;
        #   full — wait on the chunk just dispatched: admissions see the
        #     queue immediately, the ~0.2 s round-trip is paid serially.
        # Measured within noise of each other at 16-in-flight (1.42-1.47
        # seqs/s); BIOM3_CONTINUOUS_SYNC overrides for A/Bs.
        import os

        self._sync_mode = os.environ.get("BIOM3_CONTINUOUS_SYNC", "depth1")
        self._pending: deque[dict] = deque()
        self._cv = threading.Condition()
        # serializes scheduler iterations against warmup() from other
        # threads (both mutate the host-side slot state)
        self._sched_lock = threading.Lock()
        self._closed = False
        self._closing = False  # drain phase: no new submissions
        self.stats = BatcherStats()
        self._thread = threading.Thread(
            target=self._loop, name=name, daemon=True
        )
        self._thread.start()

    # -- client surface ------------------------------------------------

    def submit(self, request: dict) -> Future:
        """Queue one request.  A request carrying ``masked_ids`` (decode-
        table ids with absorbing 0 at the positions to fill — the HTTP
        inpaint payload) becomes exact-mode inpaint rows: each row starts
        at ``t0 = num_steps - n_masked`` with the masked positions on its
        ``inv`` tail in per-row random order — the reference's
        resume-from-corruption semantics
        (``Stage3_source/sampling_analysis.py:21-119``) as continuous
        rows sharing dispatches with generate traffic.  (The packed
        confidence-order inpainter remains the quality-default path;
        see ``BioM3Server(continuous_inpaint=...)``.)"""
        n_rep = int(
            request.get("num_replicas") or self.pipeline.default_replicas
        )
        fut: Future = Future()
        mids = request.get("masked_ids")
        if mids is not None and not (np.asarray(mids) == 0).any():
            # nothing to fill: resolve without consuming a slot (same
            # closed-lifecycle contract as the queued path)
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
            self._cv.notify_all()
        return fut

    def warmup(self) -> float:
        """Compile the chunk executable with one all-inert dispatch (no
        live rows, stats untouched); returns wall-clock seconds.  Safe to
        call while the server is already accepting traffic: the scheduler
        lock serializes it against the loop's own dispatches."""
        t0 = time.time()
        with self._sched_lock:
            self._dispatch_chunk(record=False)
        return round(time.time() - t0, 1)

    def close(self, timeout: float = 30.0, drain_s: float = 120.0) -> None:
        """Draining shutdown: refuse new submissions, let the scheduler
        finish the queued and mid-flight trajectories (bounded by
        ``drain_s`` — in-flight clients get their sequences instead of an
        error), then stop the thread and fail whatever did not drain in
        time.  ``drain_s=0`` is an immediate shutdown.  The join window
        covers a chunk dispatch through the serving tunnel; a retirement
        racing the final sweep skips already-failed futures."""
        with self._cv:
            self._closing = True
            self._cv.notify_all()
        deadline = time.monotonic() + drain_s
        while time.monotonic() < deadline:
            with self._cv:
                if not self._pending and not self._live_any():
                    break
            time.sleep(0.25)
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=timeout)
        self._fail_all(RuntimeError("batcher is closed"), count_error=False)

    # -- scheduler -----------------------------------------------------

    def _live_any(self) -> bool:
        return any(s is not None for s in self._slots)

    def _loop(self) -> None:
        while True:
            with self._cv:
                while (not self._closed and not self._pending
                       and not self._live_any()):
                    self._cv.wait(timeout=0.1)
                if self._closed:
                    return
            # _admit contains its own per-group error handling (a bad
            # request or a transient embed failure must not kill healthy
            # mid-flight trajectories), but an escape from it — or any
            # dispatch/retire failure, where the device carries themselves
            # are suspect — escalates to _fail_all so clients fail fast
            # instead of the daemon thread dying silently with every
            # future stranded until the HTTP timeout
            with self._sched_lock:
                try:
                    self._admit()
                    if self._live_any():
                        self._dispatch_chunk()
                        self._retire()
                except Exception as exc:  # noqa: BLE001 — to callers
                    self._fail_all(exc)

    def _row_streams(self, seed, rep: int):
        """Per-row decode order + raw RNG key words.

        Seeded: a Philox stream keyed on (seed, replica) — deterministic
        under any batch composition or admission timing.  Unseeded: the
        shared host generator seeded from the server's --seed
        (deterministic for a fixed request arrival order; the "seed"
        field is the knob for request-pinned reproducibility).
        """
        if seed is None:
            rng = self._host_rng
        else:
            # Philox key is 2x64-bit: word 0 = user seed, word 1 = replica
            # index tagged so (seed, rep) pairs never collide with plain
            # seeds
            rng = np.random.Generator(np.random.Philox(
                key=np.array(
                    [seed, (rep << 32) | 0x42494F4D], np.uint64
                )
            ))
        inv = rng.permutation(self.L).astype(np.int32)
        kd = rng.integers(
            0, 2**32, size=self._kw, dtype=np.uint64
        ).astype(np.uint32)
        return inv, kd

    def _admit(self) -> None:
        with self._cv:
            free = [s for s in range(self.R) if self._slots[s] is None]
            if not free or not self._pending:
                return
            need = [g for g in self._pending if g["z_c"] is None][: self.R]
        if need:
            # one padded embed call for every prompt still lacking z_c
            # (takes the pipeline device lock internally; never held
            # across the chunk dispatch).  A failure here fails ONLY the
            # groups whose embed it was — never the healthy mid-flight
            # trajectories (which have hundreds of steps of work done)
            try:
                _, z_c = self.pipeline.embed(
                    [g["request"]["prompt"] for g in need]
                )
            except Exception as exc:  # noqa: BLE001 — forwarded
                with self._cv:
                    for g in need:
                        try:
                            self._pending.remove(g)
                        except ValueError:
                            pass
                        if not g["future"].done():
                            g["future"].set_exception(exc)
                # one count PER FAILED GROUP, matching the MicroBatcher
                # convention (one per failed request group) so /v1/metrics
                # error counts compare across packed and continuous modes
                with self.stats._lock:
                    self.stats.errors += len(need)
                return
            for g, z in zip(need, z_c):
                g["z_c"] = np.asarray(z, np.float32)
        with self._cv:
            for s in free:
                if not self._pending:
                    break
                g = self._pending[0]
                if g["z_c"] is None:
                    break  # > R groups arrived at once; embed next round
                rep = g["next_rep"]
                try:
                    inv, kd, t_start, x_new = self._prepare_row(g, rep)
                except Exception as exc:  # noqa: BLE001 — bad request:
                    # fail this group only, keep admitting the rest
                    self._pending.popleft()
                    if not g["future"].done():
                        g["future"].set_exception(exc)
                    with self.stats._lock:
                        self.stats.errors += 1
                    continue
                self._slots[s] = (g, rep)
                self._zc[s] = g["z_c"]
                self._inv[s] = inv
                self._kd_new[s] = kd
                self._xnew[s] = x_new
                self._fresh[s] = True
                self._t0[s] = t_start
                g["next_rep"] += 1
                if g["next_rep"] >= g["n_rep"]:
                    self._pending.popleft()

    def _prepare_row(self, g: dict, rep: int):
        """Row streams + (for inpaint rows) the inv layout and start
        offset: masked positions take the inv slots the row will actually
        visit ([t_start, t_start+k), in this row's random order);
        committed positions pad the rest."""
        inv, kd = self._row_streams(g["request"].get("seed"), rep)
        mids = g["request"].get("masked_ids")
        t_start, x_new = 0, 0
        if mids is not None:
            x_new = np.asarray(mids, np.int32)
            masked_pos = np.flatnonzero(x_new == 0).astype(np.int32)
            committed = np.flatnonzero(x_new != 0).astype(np.int32)
            t_start = max(0, self._num_steps - len(masked_pos))
            order = np.argsort(inv[masked_pos], kind="stable")
            fill = np.concatenate([masked_pos[order], committed])
            inv = np.empty_like(inv)
            k = len(masked_pos)
            inv[t_start:t_start + k] = fill[:k]
            inv[:t_start] = fill[k:k + t_start]
            inv[t_start + k:] = fill[k + t_start:]
        return inv, kd, t_start, x_new

    def _dispatch_chunk(self, record: bool = True) -> None:
        """One chunk dispatch, depth-1 pipelined.

        The carries (x, key data) stay device-resident; host arrays ride
        as dispatch arguments.  The host runs at most ONE chunk ahead of
        the device: the previous chunk's tiny key-data carry is copied
        device→host asynchronously BEFORE this dispatch enters the
        stream, and waited on AFTER — so the ~0.2 s dispatch/transfer
        round-trip hides under the in-flight chunk's execution, while
        admissions still see the queue at most one boundary late.
        (Unbounded run-ahead measured WORSE on chip — 1.398 vs 1.466
        seqs/s sync — because the host then blocks in the cohort-end
        retirement fetch and requests arriving mid-burst miss all the
        boundaries dispatched ahead; fully-synchronous pays the
        round-trip serially on every chunk.)
        """
        live = int((self._t0 < self._num_steps).sum())
        x_in = self._x_dev
        if x_in is None:
            x_in = np.zeros((self.R, self.L), np.int32)
        kd_in = self._kd_dev
        if kd_in is None:
            kd_in = np.zeros((self.R, self._kw), np.uint32)
        args = [self._zc, self._inv, x_in, self._t0, kd_in, self._kd_new,
                self._fresh, self._xnew]
        if self._sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            row = NamedSharding(
                self._sharding.mesh, PartitionSpec(self._sharding.spec[0])
            )  # rank-1 arrays (t0) shard on the batch axis only
            args = [
                jax.device_put(
                    a, self._sharding if np.ndim(a) > 1 else row
                )
                for a in args
            ]
        t_start = time.monotonic()
        kd_prev = self._kd_dev
        if kd_prev is not None:
            # enqueue the previous carry's D2H before this chunk enters
            # the serial device stream — the wait below then returns when
            # the PREVIOUS chunk finishes, not this one
            kd_prev.copy_to_host_async()
        with self.pipeline._device_lock:
            self._x_dev, self._kd_dev = self._chunk_fn(self._params, *args)
        self._fresh = np.zeros_like(self._fresh)  # injected; don't re-reset
        self._t0 = np.minimum(
            self._t0 + self._step_incr, self._num_steps
        ).astype(np.int32)
        if self._sync_mode == "full":
            np.asarray(self._kd_dev)  # serial barrier on THIS chunk
        elif kd_prev is not None:
            np.asarray(kd_prev)  # depth-1 barrier (value unused)
        if record:
            self.pipeline._record_dispatch(live)
            self.stats.record(live, time.monotonic() - t_start, False)

    def _retire(self) -> None:
        finished = [
            s for s in range(self.R)
            if self._slots[s] is not None and self._t0[s] >= self._num_steps
        ]
        if not finished:
            return
        # the one synchronization point: fetch the decoding state for the
        # rows that just completed their trajectories
        x_host = np.asarray(self._x_dev)
        for s in finished:
            group, rep = self._slots[s]
            self._slots[s] = None
            seq = self._vocab.clean_sequence(
                self._vocab.decode_ids(x_host[s])
            )
            with self._cv:
                group["sequences"][rep] = seq
                group["remaining"] -= 1
                done = group["remaining"] == 0
            if done and not group["future"].done():
                # a future can already be failed by close()'s sweep if
                # this retirement raced the join timeout — skip it then
                group["future"].set_result({
                    "prompt": group["request"]["prompt"],
                    "sequences": [
                        group["sequences"][i] for i in range(group["n_rep"])
                    ],
                })

    def _fail_all(self, exc: BaseException, *,
                  count_error: bool = True) -> None:
        """Fail every queued and mid-flight request and reset the device
        carries — the dispatch/retire escalation path (device state
        suspect) and close()'s final sweep."""
        with self._cv:
            groups = {id(g): g for g in self._pending}
            for slot in self._slots:
                if slot is not None:
                    groups[id(slot[0])] = slot[0]
            self._pending.clear()
            self._slots = [None] * self.R
            self._t0[:] = self._num_steps
            self._x_dev = None   # drop possibly-poisoned device carries
            self._kd_dev = None
        if count_error:
            with self.stats._lock:
                self.stats.errors += 1
        for g in groups.values():
            if not g["future"].done():
                g["future"].set_exception(exc)
