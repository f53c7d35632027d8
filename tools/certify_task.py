"""Shared machinery for the sampler-quality certification tools.

The class-conditioned copy task (see ``certify_blocked.py``'s module
docstring for the design rationale): every sequence is ONE token repeated
across all L positions, drawn from the 4-token mode set of its z_c-encoded
class.  Trivially learnable, yet it carries exactly the inter-position
dependence that blocked / parallel / inpainting decoders must respect —
and it makes inpainting *restoration* exactly scorable: any single
revealed position determines every other one.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import ProteoScribeConfig
from biom3_tpu.models.proteoscribe import ProteoScribe
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.stage3_task import make_stage3_train_step
from biom3_tpu.training.state import TrainState

MODES = np.array([
    [3, 7, 11, 15],   # class 0 mode set
    [4, 8, 12, 16],   # class 1 mode set
])


def make_batch(rng, B, L, cond_dim):
    cls = rng.integers(0, 2, B)
    tok = MODES[cls, rng.integers(0, MODES.shape[1], B)]
    tokens = np.repeat(tok[:, None], L, axis=1).astype(np.int32)
    z_c = np.where(cls[:, None] == 0, 1.0, -1.0) * np.ones((B, cond_dim))
    return jnp.asarray(tokens), jnp.asarray(z_c.astype(np.float32)), cls


def coherence_stats(seqs: np.ndarray, cls: np.ndarray):
    """Per-row (majority-token fraction, majority-token-in-class-set), plus
    mode diversity: normalized entropy of the majority-token distribution
    within each class (1.0 = samples spread uniformly over the class's
    4-token mode set, 0.0 = every sample picked the same mode).  Guards the
    confidence-ordering A/B against trading diversity for coherence —
    easy-first commits to a mode via its most-certain position, which could
    collapse the mode distribution even while coherence improves."""
    B, L = seqs.shape
    coh = np.zeros(B)
    class_ok = np.zeros(B, bool)
    tops = np.zeros(B, seqs.dtype)
    for b in range(B):
        toks, counts = np.unique(seqs[b], return_counts=True)
        top = toks[np.argmax(counts)]
        coh[b] = counts.max() / L
        class_ok[b] = top in MODES[cls[b]]
        tops[b] = top
    ents = []
    for c in np.unique(cls):
        _, counts = np.unique(tops[cls == c], return_counts=True)
        p = counts / counts.sum()
        ents.append(-(p * np.log(p)).sum() / np.log(MODES.shape[1]))
    return coh, class_ok, float(np.mean(ents))


def build_and_train(steps: int, batch: int, seq_len: int, *,
                    chunk: int = 100, seed: int = 0,
                    state_path: str | None = None):
    """Train the toy ProteoScribe on the copy task; returns (cfg, model,
    state).  Scanned trainer: data pre-generated on host, steps chunked per
    dispatch (the tunnel adds ~0.2 s/dispatch; a python-loop trainer would
    spend 13 min dispatching 4 s of compute).

    ``state_path``: pickle of the trained params — loaded instead of
    training when it exists, written after training otherwise, so the
    certification tools (certify_blocked / certify_inpaint) share ONE
    training run per session instead of each re-training the same model
    on the same task."""
    cfg = ProteoScribeConfig(
        num_classes=29, dim=128, depth=4, n_blocks=1, heads=8, local_heads=4,
        local_window=min(64, seq_len // 2), max_seq_len=seq_len,
        num_timesteps=seq_len, cond_dim=32,
    )
    model = ProteoScribe(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
    )
    tx = make_optimizer("AdamW", 1e-3, weight_decay=1e-6)
    state = TrainState.create(params, tx)
    if state_path:
        import os
        import pickle

        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                loaded = pickle.load(f)
            if loaded["key"] != (steps, batch, seq_len, seed):
                raise ValueError(
                    f"saved state {state_path} was trained with "
                    f"{loaded['key']}, requested {(steps, batch, seq_len, seed)}"
                )
            state = state.replace(
                params=jax.tree.map(jnp.asarray, loaded["params"])
            )
            print(f"loaded trained params from {state_path}", flush=True)
            return cfg, model, state
    step = jax.jit(make_stage3_train_step(model.apply, tx))

    rng = np.random.default_rng(seed)
    chunk = min(chunk, steps)
    n_chunks = max(1, steps // chunk)
    t0 = time.time()

    @jax.jit
    def train_chunk(state, tokens_c, zc_c, key):
        def body(carry, xs):
            st, _ = carry
            tok, zc, k = xs
            st, aux = step(st, {"tokens": tok, "z_c": zc}, k)
            return (st, aux["loss"]), ()
        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)),
            (tokens_c, zc_c, jax.random.split(key, tokens_c.shape[0])),
        )
        return state, loss

    for c in range(n_chunks):
        toks = np.empty((chunk, batch, cfg.max_seq_len), np.int32)
        zcs = np.empty((chunk, batch, cfg.cond_dim), np.float32)
        for i in range(chunk):
            t_, z_, _ = make_batch(rng, batch, cfg.max_seq_len, cfg.cond_dim)
            toks[i], zcs[i] = np.asarray(t_), np.asarray(z_)
        state, loss = train_chunk(state, jnp.asarray(toks), jnp.asarray(zcs),
                                  jax.random.key(1000 + c))
        print(f"chunk {c + 1}/{n_chunks} (step {(c + 1) * chunk}): "
              f"loss {float(loss):.4f}", flush=True)
    print(f"trained {n_chunks * chunk} steps in {time.time()-t0:.0f}s",
          flush=True)
    if state_path:
        import os
        import pickle

        os.makedirs(os.path.dirname(os.path.abspath(state_path)),
                    exist_ok=True)
        with open(state_path, "wb") as f:
            pickle.dump({
                "key": (steps, batch, seq_len, seed),
                "params": jax.tree.map(
                    lambda a: np.asarray(a), state.params
                ),
            }, f)
        print(f"saved trained params to {state_path}", flush=True)
    return cfg, model, state
