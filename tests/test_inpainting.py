"""Inpainting / autocomplete / unconditional model / trajectory tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.diffusion.inpainting import (
    autocomplete,
    corrupt_samples,
    extract_samples_with_labels,
    make_inpainter,
)
from biom3_tpu.diffusion.sampler import make_sampler, sample_permutations
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.utils.animation import decode_trajectory

TINY = ProteoScribeConfig(
    num_classes=29, dim=32, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=16, max_seq_len=64, num_timesteps=64, cond_dim=16,
)


def _cond_model():
    model = ProteoScribe(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
    )
    return model, params


def test_corrupt_samples_fraction():
    real = jnp.ones((4, 64), jnp.int32) * 7
    masked, path, t = corrupt_samples(jax.random.key(0), real, 0.25, 64)
    kept = np.asarray((masked != 0).sum(axis=1))
    np.testing.assert_array_equal(kept, 16)  # 25% of 64 kept
    np.testing.assert_array_equal(np.asarray(t), 16)


@pytest.mark.slow  # 18 s; the only-masked-positions-change property stays
# default via test_inpainter_completes_trajectory on the same tiny model
def test_autocomplete_fills_only_masked():
    model, params = _cond_model()
    real = jnp.asarray(np.random.default_rng(0).integers(1, 29, (2, 64)), jnp.int32)
    masked, path, t = corrupt_samples(jax.random.key(1), real, 0.5, 64)
    completed, probs = autocomplete(model.apply, params, masked, jnp.zeros((2, 16)), t)
    completed = np.asarray(completed)
    masked_np = np.asarray(masked)
    # unmasked positions preserved
    np.testing.assert_array_equal(
        completed[masked_np != 0], masked_np[masked_np != 0]
    )
    assert probs.shape == (2, 64, 29)


def test_inpainter_completes_trajectory():
    model, params = _cond_model()
    real = jnp.asarray(np.random.default_rng(1).integers(1, 29, (2, 64)), jnp.int32)
    masked, path, t = corrupt_samples(jax.random.key(2), real, 0.25, 64)
    inpaint = make_inpainter(model.apply, TINY.num_timesteps)
    out = np.asarray(
        inpaint(params, masked, jnp.zeros((2, 16)), path, t, jax.random.key(3))
    )
    # originally-kept positions unchanged
    masked_np = np.asarray(masked)
    np.testing.assert_array_equal(out[masked_np != 0], masked_np[masked_np != 0])


def test_unconditional_model():
    model = ProteoScribe(TINY, conditional=False)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    # no y_mlp in the tree
    assert "y_mlp" not in params["params"]
    logits = model.apply(
        params, jnp.zeros((2, 64), jnp.int32), jnp.zeros((2,), jnp.int32)
    )
    assert logits.shape == (2, 64, 29)
    # conditional model without z_c raises
    cond, cparams = _cond_model()
    with pytest.raises(ValueError):
        cond.apply(cparams, jnp.zeros((1, 64), jnp.int32), jnp.zeros((1,), jnp.int32))


def test_trajectory_decode():
    model, params = _cond_model()
    sampler = make_sampler(model.apply, 64, return_trajectory=True, chunk_steps=32)
    path = sample_permutations(jax.random.key(0), 2, 64)
    final, traj = sampler(params, jnp.zeros((2, 16)), path, jax.random.key(1))
    assert traj.shape == (64, 2, 64)
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(final))
    texts = decode_trajectory(np.asarray(traj), 0, every=16)
    assert len(texts) == 4
    assert all(isinstance(t, str) for t in texts)


def test_extract_samples_with_labels():
    data = np.arange(20).reshape(5, 4)
    labels = np.asarray([1, 0, 1, 1, 0])
    out = extract_samples_with_labels(data, labels, 1, 2)
    assert len(out["sample"]) == 2
    np.testing.assert_array_equal(out["sample"][0], data[0] + 1)


def test_inpainter_confidence_order():
    """Confidence-ordered inpainting: keeps revealed positions, fills masked
    ones most-certain-first, and no-ops fully-revealed rows."""
    B, L, V = 3, 16, 6
    peak = jnp.asarray(np.linspace(1.0, 8.0, L, dtype=np.float32))

    def apply_fn(params, x, t, z_c):
        # class 1 everywhere, peakedness increasing with position
        return jnp.zeros((B, L, V)).at[..., 1].set(peak)

    masked = jnp.asarray(np.array(
        [[0] * L,                      # fully masked
         [5] * 8 + [0] * 8,            # right half masked
         [4] * L],                     # fully revealed — must no-op
        np.int32))
    t0 = jnp.asarray((masked != 0).sum(axis=1), jnp.int32)
    inpaint = make_inpainter(
        apply_fn, L, temperature=0.0, order="confidence"
    )
    out = np.asarray(inpaint(
        None, masked, None, jnp.zeros((B, L), jnp.int32), t0,
        jax.random.key(0),
    ))
    np.testing.assert_array_equal(out[0], np.ones(L))          # all filled
    np.testing.assert_array_equal(out[1], [5] * 8 + [1] * 8)   # kept + filled
    np.testing.assert_array_equal(out[2], [4] * L)             # untouched


def test_inpainter_confidence_on_real_model():
    model, params = _cond_model()
    real = jnp.asarray(
        np.random.default_rng(3).integers(1, 29, (2, 64)), jnp.int32
    )
    masked, path, t = corrupt_samples(jax.random.key(4), real, 0.5, 64)
    inpaint = make_inpainter(
        model.apply, TINY.num_timesteps, order="confidence", chunk_steps=32
    )
    out = np.asarray(
        inpaint(params, masked, jnp.zeros((2, 16)), path, t, jax.random.key(5))
    )
    masked_np = np.asarray(masked)
    # revealed positions preserved; every position visited (the random-init
    # model can legitimately sample id 0, so check via a second temp-0 run:
    # confidence order is model-determined → bit-identical)
    np.testing.assert_array_equal(out[masked_np != 0], masked_np[masked_np != 0])
    inpaint0 = make_inpainter(
        model.apply, TINY.num_timesteps, temperature=0.0, order="confidence"
    )
    a = np.asarray(inpaint0(params, masked, jnp.zeros((2, 16)), path, t,
                            jax.random.key(6)))
    b = np.asarray(inpaint0(params, masked, jnp.zeros((2, 16)), path, t,
                            jax.random.key(99)))
    np.testing.assert_array_equal(a, b)


def test_inpainter_stack_contract_matches_full_logits():
    """apply_takes_positions inpainting (the whole-stack-kernel fast path,
    one decoded position per step) must equal the full-logits path at
    temp 0 — same trajectory, chunked and unchunked."""
    from biom3_tpu.models.fused_forward import make_stack_apply

    model, params = _cond_model()
    real = jnp.asarray(
        np.random.default_rng(5).integers(1, 29, (2, 64)), jnp.int32
    )
    masked, path, t = corrupt_samples(jax.random.key(6), real, 0.5, 64)
    z_c = jnp.zeros((2, 16))

    ref = make_inpainter(model.apply, TINY.num_timesteps, temperature=0.0)
    want = np.asarray(
        ref(params, masked, z_c, path, t, jax.random.key(7))
    )
    stack_apply = make_stack_apply(
        TINY, dtype=jnp.float32, resident=True, interpret=True
    )
    for chunk in (None, 16):
        fast = make_inpainter(
            stack_apply, TINY.num_timesteps, temperature=0.0,
            apply_takes_positions=True, chunk_steps=chunk,
        )
        got = np.asarray(
            fast(params, masked, z_c, path, t, jax.random.key(7))
        )
        np.testing.assert_array_equal(got, want)


def test_encode_partial():
    from biom3_tpu.tokenizers.stage3_vocab import Stage3Vocab

    v = Stage3Vocab()
    ids = v.encode_partial("AC?G?", 10)
    # <START> A C ? G ? <END> - - -   (decode ids = train ids + 1)
    want = [1, v.train_tok_to_id["A"] + 1, v.train_tok_to_id["C"] + 1, 0,
            v.train_tok_to_id["G"] + 1, 0, v.train_tok_to_id["<END>"] + 1]
    pad = v.train_tok_to_id["-"] + 1
    np.testing.assert_array_equal(ids, want + [pad] * 3)
    # round-trip: committed ids decode back to the input characters
    assert v.decode_ids(ids[1:3]) == "AC"
    # invalid inputs fail loudly
    with pytest.raises(ValueError, match="too long"):
        v.encode_partial("A" * 9, 10)
    with pytest.raises(ValueError, match="invalid residue"):
        v.encode_partial("AJ?", 10)
    with pytest.raises(ValueError, match="unknown marker"):
        v.encode_partial("A?", 10, unknown="A")
    with pytest.raises(ValueError, match="unknown marker"):
        v.encode_partial("A?", 10, unknown="??")
    # custom marker
    ids2 = v.encode_partial("A_C", 8, unknown="_")
    assert ids2[2] == 0 and ids2[1] != 0 and ids2[3] != 0


def test_inpainter_early_exit_matches_full():
    """Chunked early exit must be a pure optimization: bit-identical temp-0
    output, and ZERO dispatches when nothing is masked."""
    model, params = _cond_model()
    real = jnp.asarray(
        np.random.default_rng(7).integers(1, 29, (2, 64)), jnp.int32
    )
    masked, path, t = corrupt_samples(jax.random.key(8), real, 0.75, 64)
    z_c = jnp.zeros((2, 16))
    full = make_inpainter(
        model.apply, 64, temperature=0.0, order="confidence", chunk_steps=16
    )
    fast = make_inpainter(
        model.apply, 64, temperature=0.0, order="confidence", chunk_steps=16,
        early_exit=True,
    )
    want = np.asarray(full(params, masked, z_c, path, t, jax.random.key(9)))
    got = np.asarray(fast(params, masked, z_c, path, t, jax.random.key(9)))
    np.testing.assert_array_equal(got, want)

    # fully revealed input: the model function must never even be traced
    def explode(*a):
        raise AssertionError("dispatched on a fully revealed batch")

    noop = make_inpainter(
        explode, 64, temperature=0.0, order="confidence", chunk_steps=16,
        early_exit=True,
    )
    out = np.asarray(noop(params, real, z_c, path, t, jax.random.key(0)))
    np.testing.assert_array_equal(out, np.asarray(real))

    with pytest.raises(ValueError, match="early_exit needs chunk_steps"):
        make_inpainter(model.apply, 64, early_exit=True)


def test_engine_inpaint_batch(tmp_path):
    from biom3_tpu.config import Config
    from biom3_tpu.pipeline.stage3 import ProteoScribeEngine
    from test_cli import TINY_STAGE3

    z_c = np.zeros((2, 16), np.float32)
    for mode, kw in (("ardm", {}), ("maskgit", {"maskgit_steps": 8})):
        engine = ProteoScribeEngine(
            Config(TINY_STAGE3), None, temperature=0.0,
            sampler_mode=mode, **kw,
        )
        masked = np.stack([
            engine.vocab.encode_partial("AC?G?MK?", 64),
            engine.vocab.encode_partial("??????", 64),
        ])
        out = engine.inpaint_batch(masked, z_c, jax.random.key(1))
        assert out.shape == masked.shape
        # committed positions (markers, residues, padding) never change
        np.testing.assert_array_equal(
            out[masked != 0], masked[masked != 0], err_msg=mode
        )
        # every absorbing position was filled
        assert (out != 0).all(), mode
        # temp-0 determinism regardless of key
        out2 = engine.inpaint_batch(masked, z_c, jax.random.key(42))
        np.testing.assert_array_equal(out, out2, err_msg=mode)


def test_inpainter_confidence_stack_contract():
    """The serving /v1/inpaint on-chip path = whole-stack kernel at
    gather_k=L + confidence-order inpainter (pos_all contract).  Interpret-
    mode twin: temp-0 trajectories must bit-match the Flax full-logits
    confidence inpainter."""
    from biom3_tpu.diffusion.inpainting import make_inpainter
    from biom3_tpu.models.fused_forward import make_stack_apply

    model, params = _cond_model()
    real = jnp.asarray(
        np.random.default_rng(11).integers(1, 29, (2, 64)), jnp.int32
    )
    masked, path, t = corrupt_samples(jax.random.key(12), real, 0.5, 64)
    z_c = jnp.zeros((2, 16))

    ref = make_inpainter(
        model.apply, 64, temperature=0.0, order="confidence"
    )
    want = np.asarray(ref(params, masked, z_c, path, t, jax.random.key(13)))

    stack_apply = make_stack_apply(
        TINY, dtype=jnp.float32, resident=True, interpret=True, gather_k=64
    )
    fast = make_inpainter(
        stack_apply, 64, temperature=0.0, order="confidence",
        apply_takes_positions=True, chunk_steps=16, early_exit=True,
    )
    got = np.asarray(fast(params, masked, z_c, path, t, jax.random.key(13)))
    np.testing.assert_array_equal(got, want)
    masked_np = np.asarray(masked)
    np.testing.assert_array_equal(got[masked_np != 0], masked_np[masked_np != 0])
