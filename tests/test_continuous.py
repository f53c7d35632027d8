"""Chunk-boundary continuous batching (serving/continuous.py +
diffusion/sampler.make_chunk_stepper).

Round-3 verdict task 2: rows must be able to join/retire a generate
dispatch at every chunk boundary, with temp-0 trajectories bit-identical
to the packed sampler and seeded requests reproducible under any batch
composition."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biom3_tpu.config import Config
from biom3_tpu.diffusion.sampler import (
    make_chunk_stepper,
    make_sampler,
    sample_permutations,
)
from biom3_tpu.pipeline.stage3 import ProteoScribeEngine

from test_cli import TINY_STAGE3
from test_serving import _post, _get, _tiny_pipeline


def _tiny_engine(**kwargs):
    return ProteoScribeEngine(
        Config(dict(TINY_STAGE3, text_emb_dim=8)), None,
        dtype=jnp.float32, **kwargs,
    )


def _zeros_state(B, L, kw=2):
    return (np.zeros((B, L), np.int32), np.zeros((B,), np.int32),
            np.zeros((B, kw), np.uint32))


def test_chunk_stepper_matches_sampler_temp0():
    """Aligned rows (all t0 advancing from 0) through the chunk stepper
    reproduce make_sampler's gather path bit-for-bit at temperature 0."""
    eng = _tiny_engine(temperature=0.0)
    L = eng.config.max_seq_len
    B = 3
    z_c = np.asarray(
        jax.random.normal(jax.random.key(1), (B, eng.config.cond_dim)),
        np.float32,
    )
    path = sample_permutations(jax.random.key(2), B, L)

    ref_sampler = make_sampler(
        eng._apply_fn, eng.config.num_timesteps, temperature=0.0,
        head_fn=eng._head_fn,
        apply_takes_positions=eng._takes_positions,
    )
    ref = np.asarray(ref_sampler(eng.params, z_c, path, jax.random.key(0)))

    chunk_fn = make_chunk_stepper(
        eng._apply_fn, eng.config.num_timesteps, chunk_steps=16,
        temperature=0.0, head_fn=eng._head_fn,
        apply_takes_positions=eng._takes_positions,
    )
    inv = np.asarray(jnp.argsort(path, axis=-1), np.int32)
    x, t0, kd = _zeros_state(B, L)
    kd_new = np.zeros_like(kd)
    for _ in range(eng.config.num_timesteps // 16):
        x, kd = chunk_fn(eng.params, z_c, inv, x, t0, kd, kd_new)
        x = np.asarray(x)
        kd = np.asarray(kd)
        t0 = t0 + 16
    np.testing.assert_array_equal(x, ref)


def test_chunk_stepper_staggered_rows_match_solo_runs():
    """A row joining mid-flight (different t0 phase, co-batched with rows
    at other phases) finishes with exactly the sequence it would get in a
    solo dispatch — row independence is what makes admission at chunk
    boundaries legal.  Also: inert rows (t0 >= num_steps) never write."""
    eng = _tiny_engine(temperature=0.0)
    L, T = eng.config.max_seq_len, eng.config.num_timesteps
    chunk = 16
    B = 3
    z_c = np.asarray(
        jax.random.normal(jax.random.key(3), (B, eng.config.cond_dim)),
        np.float32,
    )
    inv = np.stack([
        np.random.default_rng(100 + i).permutation(L).astype(np.int32)
        for i in range(B)
    ])
    chunk_fn = make_chunk_stepper(
        eng._apply_fn, T, chunk_steps=chunk, temperature=0.0,
        head_fn=eng._head_fn, apply_takes_positions=eng._takes_positions,
    )

    # solo references: each row alone in its slot (others inert)
    solo = []
    for i in range(B):
        x, t0, kd = _zeros_state(B, L)
        t0[:] = T          # all inert
        t0[i] = 0          # except row i
        zc_i = np.zeros_like(z_c)
        zc_i[i] = z_c[i]
        for _ in range(T // chunk):
            x, kd = chunk_fn(eng.params, zc_i, inv, np.asarray(x), t0,
                             np.asarray(kd), np.zeros((B, 2), np.uint32))
            t0 = np.minimum(t0 + chunk, T)
        solo.append(np.asarray(x)[i].copy())

    # staggered: row 0 starts at boundary 0, row 1 at boundary 1, row 2
    # at boundary 2 — all sharing dispatches
    x, t0, kd = _zeros_state(B, L)
    t0[:] = T
    joined = {0: 0, 1: 1, 2: 2}  # row -> joining boundary index
    results = {}
    boundary = 0
    while len(results) < B:
        for row, j in joined.items():
            if j == boundary:
                t0[row] = 0
        x, kd = chunk_fn(eng.params, z_c, inv, np.asarray(x), t0,
                         np.asarray(kd), np.zeros((B, 2), np.uint32))
        x = np.asarray(x)
        t0 = np.minimum(t0 + chunk, T)
        for row in range(B):
            if row not in results and row in joined \
                    and joined[row] * chunk + T <= (boundary + 1) * chunk:
                results[row] = x[row].copy()
        boundary += 1
    for i in range(B):
        np.testing.assert_array_equal(results[i], solo[i])


def test_chunk_stepper_per_row_rng_is_batch_invariant():
    """temperature > 0: a row's sampled tokens depend only on its own key
    data — changing the OTHER rows' contents/keys leaves it unchanged
    (what makes seeded requests reproducible in any batch mix)."""
    eng = _tiny_engine(temperature=1.0)
    L, T = eng.config.max_seq_len, eng.config.num_timesteps
    B = 2
    chunk_fn = make_chunk_stepper(
        eng._apply_fn, T, chunk_steps=T, temperature=1.0,
        head_fn=eng._head_fn, apply_takes_positions=eng._takes_positions,
    )
    rng = np.random.default_rng(0)
    inv0 = rng.permutation(L).astype(np.int32)
    kd0 = rng.integers(0, 2**32, size=2, dtype=np.uint64).astype(np.uint32)
    zc0 = rng.normal(size=(eng.config.cond_dim,)).astype(np.float32)

    outs = []
    for variant in range(2):
        inv = np.stack([
            inv0, rng.permutation(L).astype(np.int32)
        ])
        kd = np.stack([
            kd0,
            rng.integers(0, 2**32, size=2, dtype=np.uint64)
            .astype(np.uint32),
        ])
        z_c = np.stack([
            zc0, rng.normal(size=(eng.config.cond_dim,)).astype(np.float32)
        ])
        x, t0, kd_carry = _zeros_state(B, L)
        # rows enter with t0 == 0, so their RNG seeds come from kd_new
        x, _ = chunk_fn(eng.params, z_c, inv, x, t0, kd_carry, kd)
        outs.append(np.asarray(x))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert not np.array_equal(outs[0][1], outs[1][1])  # row 1 did change


def test_continuous_server_end_to_end(tmp_path):
    """HTTP server in continuous mode: correct response shapes, occupancy
    counters live, metrics labeled continuous."""
    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    server = BioM3Server(pipeline, port=0, continuous=True)
    assert server.continuous
    server.start()
    base = f"http://{server.host}:{server.port}"
    try:
        warm = server.warmup(include_inpaint=False)
        assert "generate_chunk_s" in warm
        assert "generate_s" not in warm  # packed sampler never compiled

        results = []
        errs = []

        def client(payload):
            try:
                results.append(_post(f"{base}/v1/generate", payload))
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [
            threading.Thread(target=client, args=(p,))
            for p in (
                {"prompt": "alpha helical transporter", "num_replicas": 3},
                {"prompt": "zinc finger", "num_replicas": 1},
                {"prompts": ["small binder", "large binder"],
                 "num_replicas": 2},
            )
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        n_seqs = {}
        for r in results:
            for item in r["results"]:
                n_seqs[item["prompt"]] = len(item["sequences"])
                assert all(isinstance(s, str) for s in item["sequences"])
        assert n_seqs == {
            "alpha helical transporter": 3, "zinc finger": 1,
            "small binder": 2, "large binder": 2,
        }
        metrics = _get(f"{base}/v1/metrics")
        assert metrics["generate_mode"] == "continuous"
        dev = metrics["device"]
        assert dev["dispatches"] > 0
        assert dev["rows_live"] >= 8  # 3+1+2+2 rows x >=1 chunk each
    finally:
        server.close()


def test_continuous_seeded_reproduces_under_mixed_traffic(tmp_path):
    """Same (seed, replicas) request twice, co-scheduled with different
    unseeded traffic → bit-identical sequences (per-row RNG streams)."""
    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    server = BioM3Server(pipeline, port=0, continuous=True)
    server.start()
    base = f"http://{server.host}:{server.port}"
    try:
        outs = []
        for round_i in range(2):
            results = []

            def client(payload, results=results):
                results.append(_post(f"{base}/v1/generate", payload))

            seeded = {"prompt": "membrane transport protein", "seed": 7,
                      "num_replicas": 2}
            noise = {"prompt": f"co-traffic {round_i}",
                     "num_replicas": 3 - round_i}
            ts = [threading.Thread(target=client, args=(p,))
                  for p in (seeded, noise)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=300)
            seqs = next(
                r["results"][0]["sequences"] for r in results
                if r["results"][0]["prompt"] == seeded["prompt"]
            )
            outs.append(seqs)
        assert outs[0] == outs[1]
    finally:
        server.close()


def test_continuous_batcher_close_fails_stranded_futures(tmp_path):
    from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    b = ContinuousGenerateBatcher(pipeline)
    fut = b.submit({"prompt": "p", "num_replicas": 2})
    b.close()
    # either resolved before close (fine) or failed by the drain
    exc = fut.exception(timeout=5)
    if exc is not None:
        assert isinstance(exc, RuntimeError)
    with pytest.raises(RuntimeError, match="closed"):
        b.submit({"prompt": "q"})


def test_continuous_batcher_sharded_mesh_backend(tmp_path):
    """Continuous batching over a (dp, fsdp) mesh: the chunk stepper runs
    the sharded whole-stack kernel (interpret mode on the CPU mesh), row
    arrays device_put with the batch sharding."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from biom3_tpu.parallel.mesh import MeshConfig, make_mesh
    from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

    mesh = make_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"temperature": 0.0, "chunk_steps": 32},
        mesh=mesh, interpret=True, rows_per_dispatch=8,
    )
    b = ContinuousGenerateBatcher(pipeline)
    try:
        f1 = b.submit({"prompt": "membrane transport protein"})
        f2 = b.submit({"prompt": "kinase with atp binding",
                       "num_replicas": 3})
        r1 = f1.result(timeout=300)
        r2 = f2.result(timeout=300)
        assert len(r1["sequences"]) == 2
        assert len(r2["sequences"]) == 3
        for s in r1["sequences"] + r2["sequences"]:
            assert isinstance(s, str)
            assert "<START>" not in s and "<PAD>" not in s
    finally:
        b.close()


def test_chunk_stepper_inpaint_rows_match_path_inpainter():
    """An inpaint row (t0 = T - n_masked, masked positions on the inv
    tail, x_new = partial sequence) reproduces make_inpainter's
    path-order resume bit-for-bit at temperature 0, co-batched with a
    generate row; committed positions never change."""
    from biom3_tpu.diffusion.inpainting import make_inpainter

    eng = _tiny_engine(temperature=0.0)
    L, T = eng.config.max_seq_len, eng.config.num_timesteps
    chunk = 16
    B = 2
    rng = np.random.default_rng(5)
    z_c = rng.normal(size=(B, eng.config.cond_dim)).astype(np.float32)

    # row 0: inpaint (10 masked positions); row 1: plain generate
    masked = rng.integers(2, 22, L).astype(np.int32)
    masked_pos = rng.choice(L, 10, replace=False)
    masked[masked_pos] = 0
    k = 10
    t_start = T - k
    fill_order = rng.permutation(masked_pos).astype(np.int32)
    committed_pos = np.setdiff1d(np.arange(L, dtype=np.int32), masked_pos)
    inv0 = np.concatenate([committed_pos[:t_start], fill_order,
                           committed_pos[t_start:]])
    inv1 = rng.permutation(L).astype(np.int32)
    inv = np.stack([inv0, inv1])

    chunk_fn = make_chunk_stepper(
        eng._apply_fn, T, chunk_steps=chunk, temperature=0.0,
        head_fn=eng._head_fn, apply_takes_positions=eng._takes_positions,
    )
    x = np.zeros((B, L), np.int32)
    x_new = np.stack([masked, np.zeros(L, np.int32)])
    t0 = np.array([t_start, 0], np.int32)
    fresh = np.array([True, True])
    kd = np.zeros((B, 2), np.uint32)
    for c in range(T // chunk):
        x, kd = chunk_fn(eng.params, z_c, inv, np.asarray(x), t0,
                         np.asarray(kd), np.zeros((B, 2), np.uint32),
                         fresh, x_new)
        fresh = np.zeros(B, bool)
        t0 = np.minimum(t0 + chunk, T)
    x = np.asarray(x)

    # oracle: make_inpainter order="path" — path[pos] = decode step
    path_row = np.empty(L, np.int32)
    path_row[inv0] = np.arange(L, dtype=np.int32)
    inpaint = make_inpainter(
        eng._apply_fn, T, temperature=0.0,
        apply_takes_positions=eng._takes_positions, order="path",
    )
    ref = np.asarray(inpaint(
        eng.params, masked[None, :], z_c[:1], path_row[None, :],
        np.array([t_start], np.int32), jax.random.key(0),
    ))[0]
    np.testing.assert_array_equal(x[0], ref)
    np.testing.assert_array_equal(x[0][masked != 0], masked[masked != 0])
    assert (x[0] != 0).all()
    assert (x[1] != 0).all()  # co-batched generate row completed too


def test_continuous_inpaint_server_end_to_end(tmp_path):
    """HTTP inpaint through the continuous scheduler: committed residues
    preserved, '?' filled, seeded reproducibility, instant path for
    fully-committed sequences."""
    from biom3_tpu.serving import BioM3Server

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    server = BioM3Server(pipeline, port=0, continuous=True,
                         continuous_inpaint=True)
    assert server.continuous_inpaint
    server.start()
    base = f"http://{server.host}:{server.port}"
    try:
        payload = {"prompt": "zinc finger domain",
                   "sequence": "MK??ACDE??", "num_replicas": 2, "seed": 9}
        r1 = _post(f"{base}/v1/inpaint", payload)["results"][0]
        assert len(r1["sequences"]) == 2
        from test_cli import is_subsequence

        for s in r1["sequences"]:
            assert "?" not in s
            assert is_subsequence("MKACDE", s), s
        # seeded: bit-identical on repeat
        r2 = _post(f"{base}/v1/inpaint", payload)["results"][0]
        assert r1["sequences"] == r2["sequences"]
        # nothing masked -> instant, sequence unchanged
        r3 = _post(f"{base}/v1/inpaint", {
            "prompt": "p", "sequence": "MKACDE", "num_replicas": 3,
        })["results"][0]
        assert r3["sequences"] == ["MKACDE"] * 3
        metrics = _get(f"{base}/v1/metrics")
        assert metrics["inpaint_mode"] == "continuous"
    finally:
        server.close()


def test_admit_failure_does_not_kill_inflight_rows(tmp_path):
    """A transient embed failure while admitting a NEW request must fail
    only that request — healthy mid-flight trajectories (hundreds of
    steps of work) keep running and complete (r4 code-review fix)."""
    from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    b = ContinuousGenerateBatcher(pipeline)
    try:
        f1 = b.submit({"prompt": "healthy in-flight work",
                       "num_replicas": 2})
        # wait until its rows are admitted (slots occupied)
        import time as _t

        for _ in range(200):
            if b._live_any():
                break
            _t.sleep(0.01)
        assert b._live_any()

        real_embed = pipeline.embed
        calls = {"n": 0}

        def flaky_embed(prompts):
            calls["n"] += 1
            raise RuntimeError("transient tunnel failure")

        pipeline.embed = flaky_embed
        f2 = b.submit({"prompt": "victim of flaky embed",
                       "num_replicas": 1})
        with pytest.raises(RuntimeError, match="transient"):
            f2.result(timeout=60)
        pipeline.embed = real_embed
        # the in-flight request survives and completes normally
        r1 = f1.result(timeout=120)
        assert len(r1["sequences"]) == 2
        # and the batcher still serves new traffic afterwards
        f3 = b.submit({"prompt": "recovered", "num_replicas": 1})
        assert len(f3.result(timeout=120)["sequences"]) == 1
    finally:
        b.close()


def test_close_drains_inflight_requests(tmp_path):
    """Draining shutdown: a request mid-trajectory at close() time gets
    its sequences, not a shutdown error; new submissions are refused
    during the drain."""
    from biom3_tpu.serving.continuous import ContinuousGenerateBatcher

    pipeline = _tiny_pipeline(
        tmp_path, s3_kwargs={"chunk_steps": 16, "temperature": 1.0}
    )
    b = ContinuousGenerateBatcher(pipeline)
    fut = b.submit({"prompt": "finish me", "num_replicas": 2})
    import time as _t

    for _ in range(200):
        if b._live_any():
            break
        _t.sleep(0.01)
    b.close()  # drains
    res = fut.result(timeout=5)  # already resolved by the drain
    assert len(res["sequences"]) == 2
    with pytest.raises(RuntimeError, match="closed"):
        b.submit({"prompt": "too late"})


def test_engine_rejects_continuous_for_fast_modes():
    eng = _tiny_engine(sampler_mode="maskgit")
    assert not eng.supports_continuous_stepping()
    with pytest.raises(ValueError, match="continuous"):
        eng.make_continuous_stepper()
