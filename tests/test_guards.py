"""The compiler-killer guards warn loudly before any TPU compile.

Two config combinations crashed the remote TPU compiler (HTTP 500,
BACKLOG.md "Known limitations" #1/#3) on pre-2026-08-19 backends; the
2026-08-19 backend compiles both (tools/repro_compiler_crashes.py: PASS
for scan_bwd and dl_rows2), so the former hard fences are now one-shot
warnings pointing at the repro/retest recipe.  CPU execution paths
(tests, interpret-mode twins) must stay warning-free.
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import ProteoScribeConfig

TINY = dict(
    num_classes=29, dim=64, depth=2, n_blocks=1, heads=4, local_heads=2,
    local_window=32, max_seq_len=64, num_timesteps=64, cond_dim=16,
)


def test_dl_rows2_warns():
    from biom3_tpu.models.fused_forward import make_stack_apply
    from biom3_tpu.models.proteoscribe import ProteoScribe

    cfg = ProteoScribeConfig(**{
        **TINY, "dim": 128, "max_seq_len": 128, "local_window": 64,
        "num_timesteps": 128,
    })
    model = ProteoScribe(cfg)
    params = model.init(
        jax.random.key(0), jnp.ones((1, cfg.max_seq_len), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
    )
    fn = make_stack_apply(cfg, rows=2, stream="dl", resident=True,
                          dtype=jnp.float32)
    with pytest.warns(UserWarning, match="repro_compiler_crashes"):
        try:
            fn(params, jnp.ones((2, cfg.max_seq_len), jnp.int32),
               jnp.zeros((2,), jnp.int32), jnp.zeros((2, cfg.cond_dim)),
               jnp.zeros((2, 1), jnp.int32))
        except Exception:
            # non-interpret Mosaic lowering can't execute on the CPU
            # backend — only the warning is under test here (the combo
            # itself is exercised on-chip by exp_kernels --which rows2)
            pass
    # rows=1 + "dl" stays warning-free (measured default variant)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = make_stack_apply(cfg, rows=1, stream="dl", resident=True,
                               dtype=jnp.float32, interpret=True)(
            params, jnp.ones((1, cfg.max_seq_len), jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, cfg.cond_dim)),
            jnp.zeros((1, 1), jnp.int32))
    assert out.shape == (1, 1, cfg.num_classes)


def test_plain_scan_warns_on_tpu_only():
    from biom3_tpu.models.proteoscribe import ProteoScribe

    cfg = ProteoScribeConfig(**TINY)
    x = jnp.ones((1, cfg.max_seq_len), jnp.int32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg.cond_dim), jnp.float32)

    # CPU: plain scan allowed and silent (this suite runs it)
    model = ProteoScribe(cfg, scan_layers=True, remat=False)
    params = model.init(jax.random.key(0), x, t, z)
    assert model.apply(params, x, t, z).shape == (1, cfg.max_seq_len, 29)

    # "TPU": the historical-crash warning fires but execution proceeds
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        with pytest.warns(UserWarning, match="repro_compiler_crashes"):
            out = model.apply(params, x, t, z)
    assert out.shape == (1, cfg.max_seq_len, 29)

    # scan+remat stays warning-free everywhere (--layer-mode scan_remat)
    import warnings

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        model_r = ProteoScribe(cfg, scan_layers=True, remat=True)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = model_r.apply(params, x, t, z)
    assert out.shape == (1, cfg.max_seq_len, 29)
