"""Mesh construction and sharding helpers.

Data-parallel layout (the reference's only parallelism — SURVEY §2 parallelism
table): params replicated, batch sharded over the 'batch' mesh axis; XLA emits
the gradient all-reduce (psum) over ICI automatically from the shardings.

For multi-stream video serving, independent streams ride the same batch axis:
stack frames from S streams → (S·k, H, W, C) sharded over devices, one program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """1-D device mesh over the first n_devices local devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str | None = None):
    """Shard every array leaf along its leading dim; pass through non-arrays.
    `axis` defaults to the mesh's own (first) axis name, so a cfg `mesh_axes`
    rename flows through without every caller passing it."""
    sharding = NamedSharding(mesh, P(axis or mesh.axis_names[0]))

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_module_params(params, mesh: Mesh, axis: str = "batch"):
    """Optional FSDP-style sharding of large conv kernels along out-channels.

    yolov8-small params are ~9 MB — replication is the right default; this hook
    exists for the larger scales (x: ~260 MB) where sharding the biggest kernels
    over the batch axis saves HBM (gathered on use by XLA).
    """
    def spec(path, x):
        if getattr(x, "ndim", 0) == 4 and x.shape[-1] % mesh.devices.size == 0 and x.size > 1 << 20:
            return NamedSharding(mesh, P(None, None, None, axis))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [jax.device_put(x, spec(p, x)) for p, x in flat]
    return jax.tree_util.tree_unflatten(treedef, placed)
