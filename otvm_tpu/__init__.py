"""otvm_tpu — a TPU-native (JAX/XLA/Pallas) video-matting framework.

A from-scratch rebuild of the capabilities of Hongje/OTVM (ECCV 2022,
one-trimap video matting): joint trimap propagation (STM space-time memory
attention) + alpha prediction (FBA matting), designed TPU-first:

  * NHWC channels-last layouts, static shapes, jit-once-per-resolution-bucket
  * the space-time memory read is a Pallas flash-attention kernel over an
    HBM-resident, fixed-capacity KV ring buffer (no recompiles as the video
    grows)
  * all state (params, memory bank, hidden features) is explicit pytree
    inputs/outputs; per-frame streaming inference is ONE jitted step
  * data parallelism via `jax.sharding.Mesh` + `pjit` (reference used
    PyTorch DDP/NCCL: /root/reference/train.py:62-142)

Package map (see SURVEY.md for the reference component inventory):
  nn/       conv/norm primitives, ResNet trunks, resize/pool ops, EDT
  models/   stm.py (trimap net), fba.py (alpha net), memory.py (KV bank),
            otvm.py (joint train/eval steps)
  kernels/  Pallas memory-attention kernel
  convert/  PyTorch .pth checkpoint -> JAX params converters
  data/     DIM / VideoMatting108 pipelines, trimap synthesis, augs
  train/    losses, RAdam/optax, stage-wise trainers, DP mesh
  eval/     streaming eval runner, VM108 metrics (SAD..MESSDdt)
"""

__version__ = "0.1.0"
