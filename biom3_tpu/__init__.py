"""biom3_tpu — a TPU-native (JAX/Flax/Pallas) framework for the BioM3 text→protein pipeline.

The framework re-implements, TPU-first, the full capability surface of the
BioM3 reference (three-stage pipeline; see SURVEY.md):

  * Stage 1 — PenCL: dual-tower contrastive encoder (ESM2-650M protein tower +
    PubMedBERT text tower, 512-d projection heads).
  * Stage 2 — Facilitator: weight-normalized MLP mapping z_text → z_protein.
  * Stage 3 — ProteoScribe: conditional any-order discrete-diffusion
    transformer whose 1024-step denoising loop runs on-device under
    ``jax.lax.scan``.

Layout:
  config      — typed config system ingesting the reference JSON configs verbatim
  tokenizers  — ESM alphabet, Stage-3 protein vocab, BERT wordpiece wrapper
  models      — Flax model graphs (facilitator, proteoscribe, esm2, bert, pencl)
  ops         — attention ops (linear / local-window / flash) incl. Pallas TPU kernels
  diffusion   — OA-ARDM objective + compiled samplers
  parallel    — mesh / sharding utilities (dp / fsdp / tp axes)
  training    — optax optimizers, schedules, EMA, per-stage train steps
  io          — torch-checkpoint converters + orbax checkpointing
  pipeline    — inference engines for each stage + end-to-end
  cli         — CLI entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
