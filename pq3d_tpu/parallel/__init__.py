"""Device-mesh parallelism: dp / fsdp / tp via jax.sharding + XLA collectives.

Replaces the reference's HF Accelerate DDP + NCCL stack (reference:
trainer/build.py:71-129, common/dist_utils.py; SURVEY.md §2.11) with the
single-controller JAX model: a ``Mesh`` over all chips, NamedSharding
annotations on batch and parameters, and XLA-inserted collectives (psum for
grads over 'data', all-gathers for fsdp-sharded params, tp reductions).
"""
from pq3d_tpu.parallel.mesh import (MeshConfig, make_mesh, shard_batch,
                                    shard_params, replicate)

__all__ = ["MeshConfig", "make_mesh", "shard_batch", "shard_params",
           "replicate"]
