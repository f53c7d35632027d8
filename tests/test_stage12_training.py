"""Stage-1/Stage-2 training-step tests (tiny tower configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biom3_tpu.config import BertConfig, Config, ESM2Config, PenCLConfig
from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.models.pencl import PenCL
from biom3_tpu.config import FacilitatorConfig
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.stage1_task import (
    make_stage1_optimizer,
    make_stage1_train_step,
)
from biom3_tpu.training.stage2_task import make_stage2_train_step
from biom3_tpu.training.state import TrainState

TINY = PenCLConfig(
    esm=ESM2Config(num_layers=1, embed_dim=16, attention_heads=2, vocab_size=33),
    bert=BertConfig(num_layers=1, hidden_size=16, num_heads=2,
                    intermediate_size=32, vocab_size=40,
                    max_position_embeddings=16),
    protein_embedding=16, text_embedding=16, proj_dim=8, temperature=0.8,
)


def _batch(rng, B=2):
    def toks(v, L):
        return rng.integers(4, v, (B, L)).astype(np.int32)

    batch = {
        "text_tokens": toks(40, 12), "protein_tokens": toks(30, 14),
        "pfam_text_tokens": toks(40, 12), "pfam_protein_tokens": toks(30, 14),
    }
    for k in list(batch):
        masked = batch[k].copy()
        masked[:, 2] = 32 if "protein" in k else 5
        batch[k + "_masked"] = masked
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_stage1_train_step(rng):
    model = PenCL(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    cfg = Config({"protein_encoder_lr": 1e-4, "text_encoder_lr": 1e-4,
                  "head_lr": 1e-4, "weight_decay": "5e-7"})
    tx = make_stage1_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = jax.jit(make_stage1_train_step(
        model.apply, tx, temperature=0.8, dataset_type="pfam",
        text_mask_id=5, protein_mask_id=32,
    ))
    state, aux = step(state, _batch(rng))
    for k in ("loss", "loss_align", "loss_intra", "loss_text_mask",
              "loss_seq_mask", "total_accuracy"):
        assert np.isfinite(float(aux[k])), k
    assert int(state.step) == 1


@pytest.mark.slow  # 44 s; test_remat_training_matches_no_remat covers remat math
def test_stage1_remat_matches_plain(rng):
    """remat towers (single-chip full-size memory path) change nothing
    numerically: same loss, and gradients equal to float tolerance (Adam
    would amplify last-ulp recompute differences, so compare grads, not
    post-step params)."""
    import functools

    from biom3_tpu.training.stage1_task import stage1_loss_fn

    batch = _batch(rng)
    results = []
    for remat in (False, True, "dots"):
        model = PenCL(TINY, remat=remat)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
        )
        loss_fn = functools.partial(
            stage1_loss_fn, model.apply, temperature=0.8,
            dataset_type="pfam", text_mask_id=5, protein_mask_id=32,
        )
        (loss, _), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params, batch)
        flat = jnp.concatenate(
            [g.ravel() for g in jax.tree.leaves(grads)]
        )
        results.append((float(loss), np.asarray(flat)))
    (l0, g0) = results[0]
    for l1, g1 in results[1:]:
        np.testing.assert_allclose(l0, l1, rtol=1e-6)
        rel_l2 = np.linalg.norm(g0 - g1) / max(np.linalg.norm(g0), 1e-30)
        assert rel_l2 < 1e-5, f"grad relative L2 {rel_l2}"


def test_remat_layer_mode_validation():
    """remat_layer wraps/passes through per mode and rejects bad strings."""
    import flax.linen as nn

    from biom3_tpu.models.esm2 import ESM2Layer
    from biom3_tpu.models.remat import remat_layer

    assert remat_layer(ESM2Layer, False) is ESM2Layer
    assert remat_layer(ESM2Layer, True) is not ESM2Layer
    assert remat_layer(ESM2Layer, "dots") is not ESM2Layer
    with pytest.raises(ValueError, match="unknown remat mode"):
        remat_layer(ESM2Layer, "nope")


@pytest.mark.slow  # ~25 s of compile; mode validation stays default above
def test_remat_dots_matches_plain_tiny(rng):
    """Slow-tier twin of test_stage1_remat_matches_plain on just the ESM2
    tower: the "dots" checkpoint policy (keep matmul outputs) is
    numerically identical."""
    from biom3_tpu.models.esm2 import ESM2

    toks = jnp.asarray(rng.integers(4, 30, (2, 10)).astype(np.int32))
    results = []
    for remat in (False, "dots"):
        model = ESM2(TINY.esm, remat=remat)
        params = model.init(jax.random.key(0), toks)

        def loss_fn(p):
            return jnp.sum(model.apply(p, toks)["hidden"] ** 2)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        flat = jnp.concatenate([g.ravel() for g in jax.tree.leaves(grads)])
        results.append((float(loss), np.asarray(flat)))
    (l0, g0), (l1, g1) = results
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    rel_l2 = np.linalg.norm(g0 - g1) / max(np.linalg.norm(g0), 1e-30)
    assert rel_l2 < 1e-5, f"grad relative L2 {rel_l2}"


def test_stage1_ablated_drops_intra(rng):
    model = PenCL(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    tx = make_optimizer("AdamW", 1e-4)
    state = TrainState.create(params, tx)
    batch = _batch(np.random.default_rng(0))

    step_full = jax.jit(make_stage1_train_step(
        model.apply, tx, temperature=0.8, dataset_type="pfam",
        text_mask_id=5, protein_mask_id=32, with_metrics=False))
    step_abl = jax.jit(make_stage1_train_step(
        model.apply, tx, temperature=0.8, dataset_type="pfam_ablated",
        text_mask_id=5, protein_mask_id=32, with_metrics=False))
    _, aux_f = step_full(state, batch)
    _, aux_a = step_abl(state, batch)
    expected = float(aux_f["loss"]) - float(aux_f["loss_intra"])
    assert float(aux_a["loss"]) == pytest.approx(expected, rel=1e-5)


@pytest.mark.parametrize("loss_type", ["MSE", "MMD"])
def test_stage2_train_step_learns(loss_type, rng):
    cfg = FacilitatorConfig(in_dim=8, hid_dim=16, out_dim=8)
    model = Facilitator(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8)))
    tx = make_optimizer("AdamW", 1e-2)
    state = TrainState.create(params, tx)
    step = jax.jit(make_stage2_train_step(model.apply, tx, loss_type=loss_type))
    z_t = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    z_p = z_t * 0.5 + 1.0
    batch = {"z_t": z_t, "z_p": z_p}
    first = None
    for _ in range(30):
        state, aux = step(state, batch)
        first = first if first is not None else float(aux["loss"])
    assert float(aux["loss"]) < first


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.slow  # 52 s; dryrun_multichip (driver artifact) runs this same path
def test_stage1_sharded_train_step():
    """Global-batch contrastive training over the (dp, fsdp, tp) mesh — the
    SPMD replacement for the reference's all_gather + barrier recipe."""
    from biom3_tpu.parallel.mesh import MeshConfig, make_mesh
    from biom3_tpu.training.sharded import make_sharded_train_step

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    model = PenCL(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    tx = make_optimizer("AdamW", 1e-4)
    step = make_stage1_train_step(
        model.apply, tx, temperature=0.8, dataset_type="pfam",
        text_mask_id=5, protein_mask_id=32, with_metrics=False,
    )
    run, state = make_sharded_train_step(step, tx, mesh, params, has_rng=False)
    batch = _batch(np.random.default_rng(0), B=4)  # global batch 4 shards over dp×fsdp
    state, aux = run(state, batch)
    assert np.isfinite(float(aux["loss"]))

    # must equal the unsharded loss (same data, SPMD == single device)
    state1 = TrainState.create(params, tx)
    step1 = jax.jit(step)
    _, aux1 = step1(state1, batch)
    assert float(aux["loss"]) == pytest.approx(float(aux1["loss"]), rel=1e-4)


@pytest.mark.slow  # 63 s; the per-leaf grad parity (test_esm2_block) is the
#                    fast gate — this covers the train-step glue end-to-end
def test_stage1_layer_block_matches_xla(rng):
    """The fused ESM2 layer-block training path (ops/pallas/esm2_block_tpu,
    interpret mode) reproduces the XLA step: same losses and matching
    gradients through the full Stage-1 recipe (contrastive + MLM — the MLM
    path routes compute_logits=True through the fused layers too)."""
    params = PenCL(TINY).init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    cfg = Config({"protein_encoder_lr": 1e-4, "text_encoder_lr": 1e-4,
                  "head_lr": 1e-4, "weight_decay": "5e-7"})
    tx = make_stage1_optimizer(cfg)
    batch = _batch(rng)

    auxes = {}
    states = {}
    for name, impl in (("xla", "xla"), ("block", "layer-block-interpret")):
        model = PenCL(TINY, attn_impl=impl)
        state = TrainState.create(params, tx)
        step = make_stage1_train_step(
            model.apply, tx, temperature=0.8, dataset_type="masked",
            text_mask_id=5, protein_mask_id=32,
        )
        states[name], auxes[name] = step(state, batch)

    for k in ("loss", "loss_align", "loss_text_mask", "loss_seq_mask"):
        np.testing.assert_allclose(
            float(auxes["block"][k]), float(auxes["xla"][k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    # post-Adam params are NOT compared: the first Adam step is
    # ~sign(g)·lr, which amplifies last-ulp gradient differences
    # (same caveat as test_stage1_remat_matches_plain).  Gradient
    # parity through the fused layers is covered leaf-by-leaf in
    # tests/test_esm2_block.py::test_esm2_layer_block_grad_parity.
    assert int(states["block"].step) == 1


@pytest.mark.parametrize("opt_cfg", [
    {"optimizer": "adafactor"},
    {"moment_dtype": "bfloat16"},
])
def test_stage1_compressed_optimizer_states_learn(opt_cfg, rng):
    """Optimizer-state compression (VERDICT r4 #2 — the levers for the
    B=16 single-chip HBM wall): adafactor's factored second moments and
    bf16 Adam first moments both step the toy trainer and reduce the
    loss over a short run; bf16-mu states really are bf16."""
    model = PenCL(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1, 8), jnp.int32), method=PenCL.init_all_params,
    )
    cfg = Config({"protein_encoder_lr": 3e-4, "text_encoder_lr": 3e-4,
                  "head_lr": 3e-4, "weight_decay": "5e-7", **opt_cfg})
    tx = make_stage1_optimizer(cfg)
    state = TrainState.create(params, tx)
    step = jax.jit(make_stage1_train_step(
        model.apply, tx, temperature=0.8, dataset_type="pfam",
        text_mask_id=5, protein_mask_id=32,
    ))
    batch = _batch(rng)
    losses = []
    for i in range(24):
        state, aux = step(state, batch, jax.random.key(i))
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # adafactor's relative step sizing is noisy on a toy model — compare
    # window means, not endpoints
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    if opt_cfg.get("moment_dtype") == "bfloat16":
        mus = [l for l in jax.tree.leaves(state.opt_state)
               if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
        assert mus, "no bf16 moment states found"


def test_stage1_optimizer_rejects_bad_moment_dtype():
    with pytest.raises(ValueError, match="moment_dtype"):
        make_stage1_optimizer(Config({"moment_dtype": "float16"}))
    with pytest.raises(ValueError, match="adamw only"):
        make_stage1_optimizer(Config({
            "optimizer": "adafactor", "moment_dtype": "bfloat16",
        }))
