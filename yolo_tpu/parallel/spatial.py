"""Spatially-partitioned inference: shard ONE image's height axis over the mesh.

Data parallelism (`parallel/mesh.py`) scales throughput by putting different
frames on different chips; it cannot help when a SINGLE frame's activations
don't fit one chip's HBM (giant IR / satellite / wide-area surveillance
frames at P2 resolution), or when one frame's latency matters more than
throughput. Spatial partitioning is the TPU answer the reference has no
counterpart for (its CUDA path would tile the image and stitch — here
`ops/tiling.py` plays that role for overlap-tolerant workloads): annotate the
image's H axis with a mesh sharding and XLA's GSPMD partitioner splits every
conv spatially, inserting the halo exchanges between neighboring devices over
ICI automatically. Numerics match the unsharded forward to float-rounding
tolerance (partitioned fusions reassociate reductions; tests pin the
agreement on an 8-device CPU mesh).

The Detect head's flatten (B, H*W, C) and the decode/NMS force a gather of
the (tiny) head-level tensors; all the heavy P1-P4 conv work stays sharded.

Usage::

    mesh = spatial_mesh()                      # 1-D "spatial" mesh, all devices
    fn = spatial_predict_fn(model, params, mesh)
    dets = fn(frames)                          # frames (B, H, W, C) uint8, any B

H must be divisible by the mesh size after the deepest stride; pad to a
multiple of `mesh_size * max_stride` (the letterbox already pads to stride
multiples).
"""

from __future__ import annotations

import numpy as np

MAX_DET_DEFAULT = 300


def spatial_mesh(n_devices: int | None = None, axis: str = "spatial"):
    """1-D mesh over the first `n_devices` local devices, named for the H axis."""
    from yolo_tpu.parallel.mesh import get_mesh

    return get_mesh(n_devices, axis=axis)


def shard_spatial(imgs, mesh, axis: str | None = None):
    """Place an NHWC batch with H sharded over the mesh (B/W/C replicated)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    name = axis or mesh.axis_names[0]
    return jax.device_put(imgs, NamedSharding(mesh, P(None, name, None, None)))


def spatial_predict_fn(model, params, mesh, axis: str | None = None,
                       conf: float = 0.25, iou: float = 0.7,
                       max_det: int = MAX_DET_DEFAULT, nms: bool = True,
                       dtype=None):
    """Build a jitted spatially-partitioned predict: frames → detections.

    Returns ``fn(frames)`` where frames is (B, H, W, C) uint8 (C may be 1 for
    IR — broadcast to the stem's 3 channels on device) and the result is the
    fixed-shape NMS dict (boxes/scores/cls/valid) with `nms=True`, or the raw
    (B, 4+nc, A) predictions otherwise. Params are replicated once at build
    time; each call only uploads the frame shards.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_tpu.ops.nms import non_max_suppression

    name = axis or mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    cdtype = dtype or jnp.float32

    @jax.jit
    def infer(p, imgs):
        x = imgs.astype(cdtype) / 255.0
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        preds = model.predict(p, x)
        if not nms:
            return preds
        return non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det)

    def fn(frames):
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        sharded = jax.device_put(
            frames, NamedSharding(mesh, P(None, name, None, None))
        )
        return infer(params, sharded)

    return fn
