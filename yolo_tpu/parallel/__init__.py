"""Device-mesh parallelism: data-parallel training and multi-stream inference.

Replaces the reference's DDP machinery (ref: engine/trainer.py:208-251 subprocess
torchrun + NCCL process group, utils/dist.py) with the JAX SPMD model: one
process, a `jax.sharding.Mesh` over local (or distributed) devices, batch-axis
NamedSharding, and XLA-inserted collectives over ICI. No launcher, no process
group, no rank bookkeeping — `jit` compiles the psum into the step.
"""

from yolo_tpu.parallel.mesh import get_mesh, shard_batch, replicate, shard_module_params
from yolo_tpu.parallel.spatial import spatial_mesh, shard_spatial, spatial_predict_fn

__all__ = [
    "get_mesh", "shard_batch", "replicate", "shard_module_params",
    "spatial_mesh", "shard_spatial", "spatial_predict_fn",
]
