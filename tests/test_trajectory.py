"""Row-granular packed trajectory scheduling (serving/trajectory.py +
pipeline/stage3.make_trajectory_row_fn).

Round-4 verdict task 1: fast-mode (maskgit / blocked-confidence) serving
ran at 49% of its offline rate through the request-granular MicroBatcher;
the TrajectoryBatcher packs (request, replica) rows across request
boundaries and depth-1-pipelines dispatches.  These tests pin:
temperature-0 bit-equality with the offline sampler under any batch mix,
seeded reproducibility (and cross-scheduler equality with the legacy
micro scheduler), maskgit generate+inpaint dispatch merging, row-level
packing, error isolation, and draining shutdown.
"""

import threading
import time

import numpy as np
import pytest

from test_serving import _get, _post, _tiny_pipeline


def _maskgit_pipeline(tmp_path, temperature=1.0, **pipeline_kwargs):
    return _tiny_pipeline(
        tmp_path,
        s3_kwargs={"sampler_mode": "maskgit", "maskgit_steps": 4,
                   "temperature": temperature},
        **pipeline_kwargs,
    )


def _server(pipeline, **kwargs):
    from biom3_tpu.serving import BioM3Server

    server = BioM3Server(pipeline, port=0, max_wait_s=0.02, **kwargs)
    server.start()
    return server, f"http://{server.host}:{server.port}"


def test_trajectory_is_default_for_fast_modes(tmp_path):
    """maskgit engines auto-resolve continuous=False; the non-continuous
    generate scheduler defaults to the TrajectoryBatcher, and maskgit
    inpaint rows merge into it (one executable for both row kinds)."""
    from biom3_tpu.serving.trajectory import TrajectoryBatcher

    pipeline = _maskgit_pipeline(tmp_path)
    server, base = _server(pipeline)
    try:
        assert not server.continuous
        assert isinstance(server._gen_batcher, TrajectoryBatcher)
        assert server._inpaint_batcher is server._gen_batcher
        metrics = _get(base + "/v1/metrics")
        assert metrics["generate_mode"] == "trajectory"
        assert metrics["inpaint_mode"] == "trajectory"
        assert metrics["inpaint"] == {"merged_into_generate": True}
    finally:
        server.close()


def test_trajectory_server_end_to_end_concurrent(tmp_path):
    """Concurrent generate + inpaint clients through the HTTP surface:
    every client gets its replicas; inpaint preserves committed residues;
    rows from different requests share dispatches (dispatch count well
    under one per request)."""
    pipeline = _maskgit_pipeline(tmp_path)
    server, base = _server(pipeline)
    try:
        server.warmup()
        results = {}
        errors = []

        def client(name, path, payload):
            try:
                results[name] = _post(base + path, payload)
            except Exception as exc:  # noqa: BLE001
                errors.append((name, exc))

        threads = [
            threading.Thread(target=client, args=(
                f"gen{i}", "/v1/generate",
                {"prompt": f"a tiny protein about topic {i}",
                 "num_replicas": 2},
            ))
            for i in range(4)
        ]
        committed = "ACDEF" + "?" * 20 + "GHIKL"
        threads.append(threading.Thread(target=client, args=(
            "inp", "/v1/inpaint",
            {"prompt": "fill the gap", "sequence": committed,
             "num_replicas": 2},
        )))
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for i in range(4):
            res = results[f"gen{i}"]["results"][0]
            assert len(res["sequences"]) == 2
            assert all(isinstance(s, str) for s in res["sequences"])
        from test_cli import is_subsequence

        for seq in results["inp"]["results"][0]["sequences"]:
            # committed residues survive in order (filled positions may
            # decode to marker chars that clean_sequence strips)
            assert is_subsequence("ACDEFGHIKL", seq), seq
            assert "?" not in seq
        dev = _get(base + "/v1/metrics")["device"]
        # 5 requests x 2 replicas = 10 rows; R = 4 -> >= 3 dispatches,
        # but row packing must keep it well under one per request+warmup
        assert dev["dispatches"] <= 7
        assert dev["rows_live"] >= 10
    finally:
        server.close()


def test_trajectory_temp0_matches_offline_sampler(tmp_path):
    """Temperature-0 maskgit rows are batch-mix independent (argmax per
    position): sequences served under concurrent traffic must equal a
    solo offline ``sample_batch`` on the same z_c, bit for bit."""
    pipeline = _maskgit_pipeline(tmp_path, temperature=0.0)
    server, base = _server(pipeline)
    try:
        prompts = [f"deterministic design {i}" for i in range(3)]
        results = {}

        def client(i):
            results[i] = _post(base + "/v1/generate", {
                "prompt": prompts[i], "num_replicas": 2,
            })

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        import jax

        _, z_c = pipeline.embed(prompts)
        eng = pipeline.s3
        ids = eng.sample_batch(
            np.asarray(z_c, np.float32), jax.random.key(0)
        )
        for i in range(3):
            want = eng.vocab.clean_sequence(eng.vocab.decode_ids(ids[i]))
            got = results[i]["results"][0]["sequences"]
            assert got == [want, want], (i, got, want)
    finally:
        server.close()


def test_trajectory_seeded_reproduces_and_matches_micro(tmp_path):
    """A seeded request reproduces bit-exactly under unrelated co-traffic
    AND matches the legacy request-granular scheduler (same solo-dispatch
    key contract), so the r5 scheduler swap cannot silently change seeded
    outputs."""
    pipeline = _maskgit_pipeline(tmp_path)
    server, base = _server(pipeline)
    try:
        body = {"prompt": "pinned design", "num_replicas": 2, "seed": 7}
        first = _post(base + "/v1/generate", dict(body))
        # co-traffic, then repeat the seeded request
        threads = [
            threading.Thread(
                target=_post,
                args=(base + "/v1/generate",
                      {"prompt": f"noise {i}", "num_replicas": 3}),
            )
            for i in range(3)
        ]
        for t in threads:
            t.start()
        second = _post(base + "/v1/generate", dict(body))
        for t in threads:
            t.join(timeout=300)
        assert (first["results"][0]["sequences"]
                == second["results"][0]["sequences"])
    finally:
        server.close()

    micro_server, micro_base = _server(
        _maskgit_pipeline(tmp_path), packed_scheduler="micro"
    )
    try:
        assert _get(micro_base + "/v1/metrics")["generate_mode"] == "micro"
        legacy = _post(micro_base + "/v1/generate", dict(body))
        assert (legacy["results"][0]["sequences"]
                == first["results"][0]["sequences"])
    finally:
        micro_server.close()


def test_trajectory_ardm_fast_mode_no_inpaint_merge(tmp_path):
    """Confidence-order ARDM (blocked fast mode): generate rides the
    trajectory scheduler, inpaint keeps the packed confidence-order
    MicroBatcher (separate executable), and both endpoints work."""
    from biom3_tpu.serving.batcher import MicroBatcher
    from biom3_tpu.serving.trajectory import TrajectoryBatcher

    pipeline = _tiny_pipeline(
        tmp_path,
        s3_kwargs={"decode_order": "confidence", "chunk_steps": 16,
                   "temperature": 1.0},
    )
    server, base = _server(pipeline)
    try:
        assert not server.continuous
        assert isinstance(server._gen_batcher, TrajectoryBatcher)
        assert not server._gen_batcher.accepts_masked
        assert isinstance(server._inpaint_batcher, MicroBatcher)
        metrics = _get(base + "/v1/metrics")
        assert metrics["generate_mode"] == "trajectory"
        assert metrics["inpaint_mode"] == "packed"
        res = _post(base + "/v1/generate",
                    {"prompt": "confidence order", "num_replicas": 2})
        assert len(res["results"][0]["sequences"]) == 2
        res = _post(base + "/v1/inpaint",
                    {"prompt": "fix", "sequence": "AC???????DE",
                     "num_replicas": 1})
        from test_cli import is_subsequence

        seq = res["results"][0]["sequences"][0]
        assert is_subsequence("ACDE", seq) and "?" not in seq
    finally:
        server.close()


def test_trajectory_embed_failure_isolated(tmp_path):
    """An embed failure fails ONLY the groups whose embed it was; queued
    healthy work and later traffic are unaffected, and errors count one
    per failed group (MicroBatcher convention)."""
    from biom3_tpu.serving.trajectory import TrajectoryBatcher

    pipeline = _maskgit_pipeline(tmp_path)
    b = TrajectoryBatcher(pipeline)
    try:
        ok = b.submit({"prompt": "healthy", "num_replicas": 1})
        assert len(ok.result(timeout=120)["sequences"]) == 1

        real_embed = pipeline.embed

        def flaky_embed(prompts):
            raise RuntimeError("transient tunnel failure")

        pipeline.embed = flaky_embed
        f1 = b.submit({"prompt": "victim 1", "num_replicas": 1})
        f2 = b.submit({"prompt": "victim 2", "num_replicas": 1})
        with pytest.raises(RuntimeError, match="transient"):
            f1.result(timeout=60)
        with pytest.raises(RuntimeError, match="transient"):
            f2.result(timeout=60)
        pipeline.embed = real_embed
        assert b.stats.as_dict()["errors"] == 2
        f3 = b.submit({"prompt": "recovered", "num_replicas": 2})
        assert len(f3.result(timeout=120)["sequences"]) == 2
    finally:
        b.close()


def test_trajectory_close_drains_and_rejects(tmp_path):
    """close() lets queued work finish (clients get sequences, not
    errors) and then refuses new submissions."""
    from biom3_tpu.serving.trajectory import TrajectoryBatcher

    pipeline = _maskgit_pipeline(tmp_path)
    b = TrajectoryBatcher(pipeline)
    futures = [
        b.submit({"prompt": f"drain {i}", "num_replicas": 1})
        for i in range(3)
    ]
    b.close(drain_s=120.0)
    for f in futures:
        assert len(f.result(timeout=1)["sequences"]) == 1
    with pytest.raises(RuntimeError, match="closed"):
        b.submit({"prompt": "too late", "num_replicas": 1})


def test_trajectory_inpaint_nothing_to_fill_short_circuits(tmp_path):
    """A fully committed inpaint request resolves without consuming a
    dispatch (same contract as the continuous scheduler)."""
    pipeline = _maskgit_pipeline(tmp_path)
    server, base = _server(pipeline)
    try:
        before = _get(base + "/v1/metrics")["device"]["dispatches"]
        res = _post(base + "/v1/inpaint",
                    {"prompt": "done already", "sequence": "ACDEFGHIKL",
                     "num_replicas": 2})
        assert res["results"][0]["sequences"] == ["ACDEFGHIKL"] * 2
        assert _get(base + "/v1/metrics")["device"]["dispatches"] == before
    finally:
        server.close()


def test_trajectory_large_request_spans_dispatches(tmp_path):
    """A request with more replicas than rows_per_dispatch spans several
    pipelined dispatches and still resolves with every replica."""
    pipeline = _maskgit_pipeline(tmp_path)
    server, base = _server(pipeline)
    try:
        res = _post(base + "/v1/generate",
                    {"prompt": "many replicas", "num_replicas": 10})
        assert len(res["results"][0]["sequences"]) == 10
        # seeded variant crosses the solo-dispatch chunking path
        res = _post(base + "/v1/generate",
                    {"prompt": "many seeded", "num_replicas": 6,
                     "seed": 3})
        a = res["results"][0]["sequences"]
        res = _post(base + "/v1/generate",
                    {"prompt": "many seeded", "num_replicas": 6,
                     "seed": 3})
        assert res["results"][0]["sequences"] == a
    finally:
        server.close()


def test_trajectory_warmup_compiles_row_fn(tmp_path):
    """Server warmup in trajectory mode compiles the row-fn executable
    (not the packed sampler) and the merged inpaint path skips the
    packed inpainter."""
    pipeline = _maskgit_pipeline(tmp_path)
    server, _ = _server(pipeline)
    try:
        times = server.warmup()
        assert "generate_trajectory_s" in times
        assert "generate_s" not in times
        assert "inpaint_s" not in times  # merged into generate
        assert "embed_s" in times
    finally:
        server.close()


def test_trajectory_mesh_backend(tmp_path):
    """Multi-chip fast-mode serving: the trajectory row-fn under the
    (dp, fsdp) mesh (whole-stack kernel via shard_map, interpret mode on
    the CPU mesh) — generate + merged maskgit inpaint rows, temp-0
    deterministic across servers."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from biom3_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))

    def make(tmp):
        return _tiny_pipeline(
            tmp,
            s3_kwargs={"sampler_mode": "maskgit", "maskgit_steps": 4,
                       "temperature": 0.0},
            mesh=mesh, interpret=True, rows_per_dispatch=8,
        )

    server, base = _server(make(tmp_path))
    try:
        assert _get(base + "/v1/metrics")["generate_mode"] == "trajectory"
        out = _post(base + "/v1/generate", {
            "prompts": ["membrane transport protein",
                        "kinase with atp binding"],
            "num_replicas": 2,
        })
        seqs = [r["sequences"] for r in out["results"]]
        assert all(len(s) == 2 for s in seqs)
        from test_cli import is_subsequence

        inp = _post(base + "/v1/inpaint", {
            "prompt": "zinc finger", "sequence": "MK??ACDE??",
            "num_replicas": 2,
        })
        for s in inp["results"][0]["sequences"]:
            assert "?" not in s and is_subsequence("MKACDE", s), s
    finally:
        server.close()

    # temp-0 determinism across a fresh server (same params init seed)
    server2, base2 = _server(make(tmp_path))
    try:
        out2 = _post(base2 + "/v1/generate", {
            "prompts": ["membrane transport protein",
                        "kinase with atp binding"],
            "num_replicas": 2,
        })
        assert [r["sequences"] for r in out2["results"]] == seqs
    finally:
        server2.close()
