"""boxer_tpu — a TPU-native detection framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of BoxeR
(kienduynguyen/BoxeR): end-to-end 2D detection + instance segmentation and
3D (BEV) detection built on box-attention transformers.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  ops/        multi-scale box/instance attention (pure-XLA + Pallas TPU kernels)
  nn/         Flax modules: backbones, transformers, heads, matchers
  models/     registered model architectures (boxer2d, boxer3d, detr)
  criterion/  losses + metrics (set-prediction losses, fixed-shape masked)
  dataset/    input pipeline: COCO / Waymo tasks, processors, host prefetch
  optim/      optax optimizers + LR schedules
  parallel/   device mesh, sharding rules, SPMD train/eval steps
  trainer/    training engine, checkpointing, meters, eval loops
  evaluate/   COCO mAP evaluator (self-contained), Waymo export
  utils/      config system, box ops, logging, timers
"""

__version__ = "0.1.0"
