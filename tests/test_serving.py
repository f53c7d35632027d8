"""Serving subsystem: micro-batcher semantics + the HTTP daemon end-to-end.

The HTTP test builds the same tiny random-init three-stage pipeline the
e2e CLI test uses (test_cli.py fixtures) and drives the real server —
threads, batcher, JSON API — over localhost.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from biom3_tpu.serving import MicroBatcher


# ---------------------------------------------------------------- batcher


def test_batcher_results_map_one_to_one():
    b = MicroBatcher(lambda xs: [x * 2 for x in xs], max_batch=4)
    futs = [b.submit(i) for i in range(10)]
    assert [f.result(timeout=10) for f in futs] == [2 * i for i in range(10)]
    stats = b.stats.as_dict()
    assert stats["requests"] == 10 and stats["items"] == 10
    assert stats["batches"] <= 10 and stats["errors"] == 0
    b.close()


def test_batcher_coalesces_under_concurrency():
    """A slow first batch lets later submissions pile up; the next dispatch
    must carry more than one item (true coalescing, not 1-by-1)."""
    release = threading.Event()

    def run(xs):
        if xs[0] == 0:  # hold the first batch until the queue fills
            release.wait(timeout=10)
        return xs

    b = MicroBatcher(run, max_batch=8, max_wait_s=0.01)
    first = b.submit(0)
    time.sleep(0.05)  # dispatcher is now blocked inside run([0])
    rest = [b.submit(i) for i in range(1, 6)]
    release.set()
    assert first.result(timeout=10) == 0
    assert [f.result(timeout=10) for f in rest] == [1, 2, 3, 4, 5]
    stats = b.stats.as_dict()
    assert stats["batches"] == 2, stats  # [0] then [1..5] coalesced
    assert stats["items"] == 6
    b.close()


def test_batcher_exception_propagates_and_recovers():
    def run(xs):
        if any(x < 0 for x in xs):
            raise ValueError("negative")
        return xs

    b = MicroBatcher(run, max_batch=1)
    bad = b.submit(-1)
    with pytest.raises(ValueError, match="negative"):
        bad.result(timeout=10)
    ok = b.submit(7)
    assert ok.result(timeout=10) == 7
    assert b.stats.as_dict()["errors"] == 1
    b.close()


def test_batcher_length_mismatch_is_an_error():
    b = MicroBatcher(lambda xs: xs[:-1], max_batch=1)
    with pytest.raises(RuntimeError, match="returned"):
        b.submit(1).result(timeout=10)
    b.close()


def test_batcher_rejects_after_close():
    b = MicroBatcher(lambda xs: xs, max_batch=1)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)


def test_batcher_close_fails_stranded_futures():
    """An item that slips into the queue after the dispatcher exits (a
    submit racing close) must get its future failed by close()'s drain
    rather than hanging until the request timeout."""
    from concurrent.futures import Future

    b = MicroBatcher(lambda xs: xs, max_batch=1)
    b.close()  # dispatcher thread has exited
    fut: Future = Future()
    b._queue.put(("stranded", fut))  # the race window
    b.close()  # drain pass
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=5)


def test_plan_models_confidence_gather():
    """gather_k=L (confidence ordering) must grow the modeled VMEM working
    set — the plan can't silently promise headroom it never budgeted."""
    from biom3_tpu.config import ProteoScribeConfig
    from biom3_tpu.models.fused_forward import plan_stack_kernel

    import re

    cfg = ProteoScribeConfig()  # published shape: L=1024, d=512, 16 layers
    small = plan_stack_kernel(cfg, gather_k=8)
    big = plan_stack_kernel(cfg, gather_k=cfg.max_seq_len)
    assert small["supported"]
    mb = [int(re.search(r"(\d+) MB", p["reason"]).group(1))
          for p in (small, big)]
    assert mb[1] >= mb[0] + 5, (small, big)  # ~6 MB of gather/head buffers
    # at the published shape the k=L gather still fits (114 of 120 MB)
    assert big["supported"] and big["resident"], big


# ------------------------------------------------------------ HTTP daemon


def _tiny_pipeline(tmp_path, s3_kwargs=None, **pipeline_kwargs):
    import jax.numpy as jnp

    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage1 import PenCLEngine
    from biom3_tpu.pipeline.stage2 import FacilitatorEngine
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from biom3_tpu.serving import ServingPipeline
    from test_cli import TINY_STAGE3, _write_wordpiece_tokenizer

    tok_dir = tmp_path / "tok"
    vocab_size = _write_wordpiece_tokenizer(tok_dir)
    s1 = PenCLEngine(Config({
        "protein_encoder_embedding": 16, "text_encoder_embedding": 16,
        "esm_num_layers": 1, "esm_attention_heads": 2,
        "bert_num_layers": 1, "bert_num_heads": 2,
        "bert_intermediate_size": 32, "bert_vocab_size": vocab_size,
        "bert_max_position_embeddings": 32, "proj_embedding_dim": 8,
        "temperature": 0.8, "text_max_length": 32,
        "text_model_path": str(tok_dir),
    }), None, text_only=True)
    s2 = FacilitatorEngine(
        Config({"emb_dim": 8, "hid_dim": 16, "dropout": 0.0,
                "loss_type": "MMD"}), None,
    )
    s3 = ProteoScribeEngine(
        Config(dict(TINY_STAGE3, text_emb_dim=8)), None, dtype=jnp.float32,
        **(s3_kwargs or {}),
    )
    kwargs = dict(rows_per_dispatch=4, default_replicas=2, seed=0)
    kwargs.update(pipeline_kwargs)
    return ServingPipeline(s1, s2, s3, **kwargs)


def _post(url: str, payload: dict, timeout: float = 300.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(url: str, timeout: float = 30.0) -> dict:
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_http_server_end_to_end(tmp_path):
    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(tmp_path)
    server = BioM3Server(pipeline, port=0, max_wait_s=0.02)
    server.start()
    base = f"http://{server.host}:{server.port}"
    try:
        health = _get(f"{base}/healthz")
        assert health["status"] == "ok"
        assert health["rows_per_dispatch"] == 4

        # generate: two prompts in one request, plus two concurrent
        # single-prompt clients — all coalesce through the batcher
        results: dict = {}

        def client(name, payload):
            results[name] = _post(f"{base}/v1/generate", payload)

        threads = [
            threading.Thread(target=client, args=(
                "a", {"prompts": ["membrane transport protein",
                                  "kinase with atp binding"],
                      "num_replicas": 2})),
            threading.Thread(target=client, args=(
                "b", {"prompt": "small heat shock protein"})),
            threading.Thread(target=client, args=(
                "c", {"prompt": "zinc finger domain", "num_replicas": 1})),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {"a", "b", "c"}
        a, b, c = results["a"], results["b"], results["c"]
        assert len(a["results"]) == 2
        for r in a["results"]:
            assert len(r["sequences"]) == 2
        assert len(b["results"][0]["sequences"]) == 2  # default replicas
        assert len(c["results"][0]["sequences"]) == 1
        for r in a["results"] + b["results"] + c["results"]:
            for seq in r["sequences"]:
                assert isinstance(seq, str)
                assert "<START>" not in seq and "<PAD>" not in seq

        # inpaint: committed residues survive, unknowns get filled
        inp = _post(f"{base}/v1/inpaint", {
            "prompt": "zinc finger domain",
            "sequence": "MK??ACDE??",
            "num_replicas": 2,
        })
        filled = inp["results"][0]["sequences"]
        assert len(filled) == 2
        from test_cli import is_subsequence

        for seq in filled:
            assert isinstance(seq, str)
            assert "<START>" not in seq and "<PAD>" not in seq
            assert "?" not in seq
            # committed residues survive in order (filled positions may
            # decode to marker tokens on a random-init model and get
            # stripped, so exact positions aren't stable — order is)
            assert is_subsequence("MKACDE", seq), seq

        # embed
        emb = _post(f"{base}/v1/embed", {"prompts": ["protein binding"]})
        z = emb["results"][0]
        assert len(z["z_t"]) == 8 and len(z["z_c"]) == 8
        assert np.isfinite(z["z_t"]).all() and np.isfinite(z["z_c"]).all()

        # metrics reflect the traffic
        metrics = _get(f"{base}/v1/metrics")
        assert metrics["generate"]["requests"] == 4  # a:2 + b:1 + c:1
        assert metrics["generate"]["errors"] == 0
        assert metrics["embed"]["requests"] == 1
        assert metrics["inpaint"]["requests"] == 1
        assert metrics["inpaint"]["errors"] == 0
        assert metrics["memory"]["host_rss_mb"] > 0
        assert isinstance(metrics["memory"]["hbm_mb"], dict)
        dev = metrics["device"]  # row-level packing counters
        assert dev["rows_live"] == 2 * 2 + 2 + 1 + 2  # a+b+c + inpaint rows
        assert dev["dispatches"] >= 3  # 9 rows at 4/dispatch
        assert 0 < dev["row_occupancy"] <= 1.0

        # profile capture: a short trace window produces a log dir; only
        # one capture at a time (process-global jax profiler)
        import os

        prof = _post(f"{base}/v1/profile", {"seconds": 0.2})
        assert prof["log_dir"] and os.path.isdir(prof["log_dir"])
        server._profile_lock.acquire()
        try:
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                _post(f"{base}/v1/profile", {"seconds": 0.2})
            assert exc_info.value.code == 409
        finally:
            server._profile_lock.release()

        # bad requests → 400, unknown route → 404
        for path, payload, code in (
            ("/v1/profile", {"seconds": 0}, 400),
            ("/v1/profile", {"seconds": "x"}, 400),
            ("/v1/profile", {"seconds": 2, "log_dir": 5}, 400),
            ("/v1/profile", {"seconds": True}, 400),
            ("/v1/generate", {}, 400),
            ("/v1/generate", {"prompt": "  "}, 400),
            ("/v1/generate", {"prompt": "x", "num_replicas": 0}, 400),
            ("/v1/generate", {"prompt": "x", "num_replicas": "abc"}, 400),
            ("/v1/generate", {"prompt": "x", "num_replicas": 10**9}, 400),
            ("/v1/generate", {"prompt": "x", "num_replicas": True}, 400),
            ("/v1/generate", {"prompt": "x", "seed": -1}, 400),
            ("/v1/generate", {"prompt": "x", "seed": "y"}, 400),
            ("/v1/generate", ["not", "an", "object"], 400),
            # a bare string must not be iterated per character
            ("/v1/generate", {"prompts": "design a kinase"}, 400),
            ("/v1/generate", {"prompts": {"p": "x"}}, 400),
            ("/v1/embed", {}, 400),
            ("/v1/embed", {"prompts": ["ok", 42]}, 400),
            ("/v1/embed", {"prompts": "design a kinase"}, 400),
            ("/v1/embed", {"prompts": []}, 400),
            ("/v1/inpaint", {"sequence": "MK??"}, 400),            # no prompt
            ("/v1/inpaint", {"prompt": "x"}, 400),                 # no seq
            ("/v1/inpaint", {"prompt": "x", "sequence": ""}, 400),
            ("/v1/inpaint", {"prompt": "x", "sequence": "MJ??"}, 400),  # J
            ("/v1/inpaint", {"prompt": "x", "sequence": "A" * 63}, 400),
            ("/v1/inpaint", {"prompt": "x", "sequence": "M??",
                             "unknown": "??"}, 400),
            ("/v1/inpaint", {"prompt": "x", "sequence": "M??",
                             "num_replicas": 0}, 400),
            ("/v1/nope", {"prompt": "x"}, 404),
        ):
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                _post(f"{base}{path}", payload)
            assert exc_info.value.code == code, path
    finally:
        server.close()


def test_serving_pipeline_mesh_backend(tmp_path):
    """Multi-chip serving through the daemon: Stage-3 rows spread over the
    (dp, fsdp) mesh axes via the whole-stack kernel under shard_map
    (interpret mode on the CPU mesh)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from biom3_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"temperature": 0.0, "chunk_steps": 32},
        mesh=mesh, interpret=True, rows_per_dispatch=8,
    )
    reqs = [
        {"prompt": "membrane transport protein"},           # default 2
        {"prompt": "kinase with atp binding", "num_replicas": 3},
    ]
    out = pipeline.generate(reqs)
    assert len(out[0]["sequences"]) == 2
    assert len(out[1]["sequences"]) == 3
    for r in out:
        for s in r["sequences"]:
            assert isinstance(s, str)
            assert "<START>" not in s and "<PAD>" not in s
    # 5 live rows padded into one 8-row sharded dispatch
    dev = pipeline.device_stats()
    assert dev == {"dispatches": 1, "rows_live": 5, "rows_padded": 3,
                   "row_occupancy": 0.625}

    # inpainting through the sharded backend: committed residues survive,
    # temp-0 deterministic across calls
    inp = pipeline.inpaint([{"prompt": "zinc finger domain",
                             "sequence": "MK??ACDE??", "num_replicas": 2}])
    assert len(inp[0]["sequences"]) == 2
    inp2 = pipeline.inpaint([{"prompt": "zinc finger domain",
                              "sequence": "MK??ACDE??", "num_replicas": 2}])
    assert inp[0]["sequences"] == inp2[0]["sequences"]

    from test_cli import is_subsequence

    for s in inp[0]["sequences"]:
        assert "?" not in s
        assert is_subsequence("MKACDE", s), s
    # temp-0 replicas of one prompt collapse under path ordering only if
    # paths coincide — instead check determinism across identical calls
    out2 = _tiny_pipeline(
        tmp_path, s3_kwargs={"temperature": 0.0, "chunk_steps": 32},
        mesh=mesh, interpret=True, rows_per_dispatch=8,
    ).generate(reqs)
    assert [r["sequences"] for r in out] == [r["sequences"] for r in out2]

    # misaligned rows_per_dispatch rejected loudly
    with pytest.raises(ValueError, match="multiple of the mesh"):
        _tiny_pipeline(tmp_path, mesh=mesh, rows_per_dispatch=6)


def test_seeded_requests_reproduce(tmp_path):
    """A request carrying a seed gets its own deterministic dispatch:
    identical results across calls regardless of co-batched traffic."""
    pipeline = _tiny_pipeline(tmp_path)
    a = pipeline.generate([
        {"prompt": "membrane transport protein", "seed": 7,
         "num_replicas": 2},
        {"prompt": "unrelated co-traffic"},  # unseeded, packed separately
    ])
    b = pipeline.generate([
        {"prompt": "other noise", "num_replicas": 3},
        {"prompt": "membrane transport protein", "seed": 7,
         "num_replicas": 2},
    ])
    assert a[0]["sequences"] == b[1]["sequences"]
    c = pipeline.generate([
        {"prompt": "membrane transport protein", "seed": 8,
         "num_replicas": 2},
    ])
    assert c[0]["sequences"] != a[0]["sequences"]  # different seed


def test_pipeline_warmup_compiles_all_executables(tmp_path):
    """warmup() runs one padded dispatch per endpoint; later requests reuse
    the executables (dispatch counters prove the warmup dispatches ran)."""
    pipeline = _tiny_pipeline(tmp_path)
    times = pipeline.warmup()
    assert set(times) == {"embed_s", "generate_s", "inpaint_s"}
    assert all(t >= 0 for t in times.values())
    # warmup dispatches bypass the packing counters (they'd skew the
    # live-traffic occupancy an operator reads off /v1/metrics)
    assert pipeline.device_stats()["dispatches"] == 0
    out = pipeline.generate([{"prompt": "membrane protein",
                              "num_replicas": 1}])
    assert len(out[0]["sequences"]) == 1
    inp = pipeline.inpaint([{"prompt": "kinase", "sequence": "MK??"}])
    assert all("?" not in s for s in inp[0]["sequences"])
    assert pipeline.device_stats()["dispatches"] == 2


def test_seeded_inpaint_reproduces(tmp_path):
    """Seeded inpainting dispatches alone and reproduces bit-exactly;
    committed ids survive at the engine level."""
    pipeline = _tiny_pipeline(tmp_path)
    req = {"prompt": "membrane transport protein",
           "sequence": "MK??ACDE??", "seed": 11, "num_replicas": 2}
    a = pipeline.inpaint([dict(req)])
    b = pipeline.inpaint([dict(req), {"prompt": "co-traffic noise",
                                      "sequence": "????"}])
    assert a[0]["sequences"] == b[0]["sequences"]
    c = pipeline.inpaint([dict(req, seed=12)])
    assert c[0]["sequences"] != a[0]["sequences"]


@pytest.mark.slow  # ~1 min: the e2e test covers each endpoint; this one
# drives all three endpoint types CONCURRENTLY (three batcher dispatch
# threads interleaving on the pipeline device lock)
def test_mixed_endpoint_concurrency(tmp_path):
    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(tmp_path)
    server = BioM3Server(pipeline, port=0, max_wait_s=0.02)
    server.start()
    base = f"http://{server.host}:{server.port}"
    results: dict = {}

    def client(name, path, payload):
        results[name] = _post(f"{base}{path}", payload)

    try:
        threads = [
            threading.Thread(target=client, args=(f"g{i}", "/v1/generate",
                             {"prompt": f"transport protein {i}",
                              "num_replicas": 1}))
            for i in range(2)
        ] + [
            threading.Thread(target=client, args=(f"e{i}", "/v1/embed",
                             {"prompts": [f"kinase {i}"]}))
            for i in range(2)
        ] + [
            threading.Thread(target=client, args=(f"i{i}", "/v1/inpaint",
                             {"prompt": f"zinc finger {i}",
                              "sequence": "MK??ACDE??",
                              "num_replicas": 1}))
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {"g0", "g1", "e0", "e1", "i0", "i1"}
        for i in range(2):
            assert len(results[f"g{i}"]["results"][0]["sequences"]) == 1
            assert len(results[f"e{i}"]["results"][0]["z_c"]) == 8
            seq = results[f"i{i}"]["results"][0]["sequences"][0]
            assert "?" not in seq
        metrics = _get(f"{base}/v1/metrics")
        for kind in ("generate", "embed", "inpaint"):
            assert metrics[kind]["errors"] == 0, (kind, metrics[kind])
            assert metrics[kind]["requests"] == 2, (kind, metrics[kind])
    finally:
        server.close()


def test_load_tool_against_inprocess_server(tmp_path):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "tools"))
    from load_test_server import run_load

    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(tmp_path)
    server = BioM3Server(pipeline, port=0, max_wait_s=0.02)
    server.start()
    try:
        report = run_load(
            f"http://{server.host}:{server.port}",
            clients=4, requests_per_client=2, num_replicas=1,
        )
        assert report["errors"] == 0, report
        assert report["completed"] == 8
        assert report["latency_p50_s"] > 0
        assert report["server_metrics"]["generate"]["requests"] == 8
        # concurrency must actually coalesce: fewer dispatches than requests
        assert report["server_metrics"]["generate"]["batches"] < 8, report
    finally:
        server.close()


def test_load_tool_mixed_traffic_continuous(tmp_path):
    """--endpoint mixed: generate and inpaint clients share the continuous
    scheduler's dispatches (r4); per-endpoint latencies reported."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]
                           / "tools"))
    from load_test_server import run_load

    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    server = BioM3Server(pipeline, port=0, continuous=True,
                         continuous_inpaint=True)
    server.start()
    try:
        report = run_load(
            f"http://{server.host}:{server.port}",
            clients=4, requests_per_client=2, num_replicas=2,
            endpoint="mixed", sequence="MK??ACDE??",
        )
        assert report["errors"] == 0, report
        assert report["completed"] == 8
        assert report["generate_completed"] == 4
        assert report["inpaint_completed"] == 4
        assert report["generate_p50_s"] > 0
        assert report["inpaint_p50_s"] > 0
        sm = report["server_metrics"]
        assert sm["generate_mode"] == "continuous"
        assert sm["inpaint_mode"] == "continuous"
        assert sm["inpaint"] == {"merged_into_generate": True}
    finally:
        server.close()


@pytest.mark.slow  # subprocess startup + compile; the in-process test above
# covers the batching/HTTP logic — this drives the CLI wrapper itself
def test_server_cli_subprocess(tmp_path):
    import os
    import subprocess
    import sys

    from test_cli import REPO, build_tiny_stage_files

    stage_flags = build_tiny_stage_files(tmp_path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # machine-keyed cache dir set by conftest
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ["JAX_COMPILATION_CACHE_DIR"]
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "biom3_tpu.cli.run_server",
         *[a for kv in stage_flags.items() for a in kv],
         "--port", "0", "--rows_per_dispatch", "4", "--num_replicas", "1"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # stderr merges into stdout, and XLA/absl may log diagnostics (e.g.
        # cross-machine persistent-cache AOT warnings) before the protocol
        # line — scan for it instead of trusting line 1
        seen = []
        for _ in range(200):
            line = proc.stdout.readline().strip()
            seen.append(line)
            if line.startswith("serving on http://"):
                break
            assert line, f"server exited before protocol line:\n" + "\n".join(seen)
        assert line.startswith("serving on http://"), "\n".join(seen)
        base = line.split()[-1]
        out = _post(f"{base}/v1/generate",
                    {"prompt": "membrane transport protein"})
        assert len(out["results"][0]["sequences"]) == 1
        assert _get(f"{base}/healthz")["status"] == "ok"
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_embed_rows_device_matches_embed(tmp_path):
    """The scheduler's device-resident admission embed (r5: one async
    enqueue chain, no host round-trip) must produce the SAME z_c as the
    client-surface embed() — bit-exact in f32 parity mode."""
    import numpy as np

    pipeline = _tiny_pipeline(tmp_path)
    prompts = ["membrane transport protein", "kinase", "zinc finger"]
    _, z_c = pipeline.embed(prompts)
    z_dev = np.asarray(pipeline.embed_rows_device(prompts))
    assert z_dev.shape == z_c.shape
    np.testing.assert_array_equal(z_dev, z_c)


def test_embed_cache_hits_and_equality(tmp_path):
    """The prompt→(z_t, z_c) LRU: repeated prompts skip the towers, the
    values are bit-identical to uncached embeds, dedup happens within a
    batch, and the capacity bound evicts LRU-first."""
    import numpy as np

    pipeline = _tiny_pipeline(tmp_path)
    uncached = _tiny_pipeline(tmp_path, embed_cache=0)
    calls = {"n": 0}
    real = pipeline.s1.embed_text

    def counting(prompts, batch_size=32):
        calls["n"] += 1
        return real(prompts, batch_size=batch_size)

    pipeline.s1.embed_text = counting

    prompts = ["alpha helix bundle", "beta barrel", "alpha helix bundle"]
    z_t, z_c = pipeline.embed(prompts)
    assert calls["n"] == 1
    ref_t, ref_c = uncached.embed(prompts)
    np.testing.assert_array_equal(np.asarray(z_t, np.float32),
                                  np.asarray(ref_t, np.float32))
    np.testing.assert_array_equal(z_c, ref_c)
    # within-batch dedup: identical rows for identical prompts
    np.testing.assert_array_equal(z_c[0], z_c[2])

    # full repeat: zero tower calls
    z_t2, z_c2 = pipeline.embed(prompts)
    assert calls["n"] == 1
    np.testing.assert_array_equal(z_c2, z_c)
    stats = pipeline.embed_cache_stats()
    assert stats["hits"] >= 3 and stats["size"] == 2

    # capacity bound
    small = _tiny_pipeline(tmp_path, embed_cache=2)
    for i in range(4):
        small.embed([f"prompt {i}"])
    assert small.embed_cache_stats()["size"] == 2
