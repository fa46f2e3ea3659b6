"""PQ3D-TPU: a TPU-native JAX framework for promptable 3D vision-language understanding.

A ground-up re-design of the capabilities of PQ3D ("Unifying 3D Vision-Language
Understanding via Promptable Queries", ECCV 2024) for TPU hardware:

- compute path: JAX / XLA / Pallas, static shapes, bfloat16 matmuls on the MXU
- parallelism: ``jax.sharding.Mesh`` + XLA collectives (dp / fsdp / tp axes)
- sparse 3D convolution: host-built kernel maps + device gather->GEMM->scatter
- host pipeline: numpy voxelization / FPS / kernel-map building, device-ready
  fixed-shape batches (no recompilation across scenes)

Layer map mirrors the reference framework (see SURVEY.md):
  run.py -> trainer -> model -> modules -> ops        (control, top-down)
  data -> batching -> model -> losses -> evaluators   (data, bottom-up)
"""

__version__ = "0.1.0"
