"""Stage-2 training CLI: Facilitator (z_t → z_p) on Stage-1 embedding dicts.

Mirrors the reference's ``PL_Facilitator`` runtime (``Stage1_source/
PL_wrapper.py:1506-1613``) driven by ``stage2_config.json``: MSE or MMD loss
per ``loss_type``, AdamW, train/val split per ``valid_size``/``seed``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from biom3_tpu.config import FacilitatorConfig, load_json_config
from biom3_tpu.data.loader import BatchLoader
from biom3_tpu.data.stage2_data import FacilitatorDataset
from biom3_tpu.models.facilitator import Facilitator
from biom3_tpu.training.optim import make_optimizer
from biom3_tpu.training.stage2_task import make_stage2_train_step, stage2_loss_fn
from biom3_tpu.training.state import TrainState
from biom3_tpu.utils.logging import MetricLogger


def parse_arguments():
    p = argparse.ArgumentParser(description="BioM3 Stage-2 training")
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--swissprot_data_path", type=str, default=None)
    p.add_argument("--pfam_data_path", type=str, default=None)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--export_bin", type=str, default=None,
                   help="after training, also write the params as a "
                        "published main.* weight-norm .bin — directly "
                        "servable via run_facilitator_sample")
    return p.parse_args()


def main() -> None:
    args = parse_arguments()
    cfg = load_json_config(args.json_path)
    model_cfg = FacilitatorConfig.from_stage_config(cfg)

    dataset = FacilitatorDataset.from_paths(
        args.swissprot_data_path or cfg.str_or_none("stage1_dataset_path"),
        args.pfam_data_path,
        valid_size=cfg.float("valid_size", 0.2),
        seed=cfg.int("seed", 42),
    )
    z_t_train, z_p_train = dataset.split("train")
    z_t_val, z_p_val = dataset.split("val")
    print(f"train: {len(z_t_train)}, val: {len(z_t_val)}")

    model = Facilitator(model_cfg)
    params = model.init(
        jax.random.key(cfg.int("seed", 42)), jnp.zeros((1, model_cfg.in_dim))
    )
    tx = make_optimizer("AdamW", args.lr)
    state = TrainState.create(params, tx)

    from biom3_tpu.io.orbax_io import CheckpointManager

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")
    loss_type = cfg.get("loss_type", "MMD")
    step_fn = jax.jit(make_stage2_train_step(model.apply, tx, loss_type=loss_type))
    val_loss_fn = jax.jit(
        lambda p: stage2_loss_fn(
            model.apply, p, jnp.asarray(z_t_val), jnp.asarray(z_p_val),
            loss_type=loss_type,
        )[0]
    )

    def make_batch(idx):
        return {"z_t": jnp.asarray(z_t_train[idx]), "z_p": jnp.asarray(z_p_train[idx])}

    loader = BatchLoader(
        len(z_t_train), cfg.int("batch_size", 64), make_batch,
        seed=cfg.int("seed", 42),
    )
    logger = MetricLogger(args.output_dir)
    for epoch in range(args.epochs):
        for batch in loader:
            state, aux = step_fn(state, batch)
        val = float(val_loss_fn(state.params)) if len(z_t_val) else float("nan")
        print(f"epoch {epoch}: train_loss={float(aux['loss']):.6f} val_loss={val:.6f}")
        logger.log(int(state.step), {"train_loss": aux["loss"], "val_loss": val})

    ckpt.save(int(state.step), state, wait=True)
    logger.close()
    if args.export_bin:
        from biom3_tpu.io.export import facilitator_params_to_torch
        from biom3_tpu.io.torch_load import save_torch_file

        tree = jax.tree.map(np.asarray, {"params": state.params["params"]})
        save_torch_file(
            facilitator_params_to_torch(tree, model_cfg), args.export_bin
        )
        print(f"exported params to {args.export_bin}")
    print(f"saved final checkpoint at step {int(state.step)}")


if __name__ == "__main__":
    main()
