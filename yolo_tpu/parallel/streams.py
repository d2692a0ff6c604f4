"""Multi-stream video inference sharded over the device mesh.

The reference serves multiple streams with one thread per source feeding one
GPU (ref: data/loaders.py LoadStreams:54 + per-stream trackers
trackers/track.py:62-69). The TPU design stacks the S streams' current frames
into one (S, H, W, C) batch sharded over the mesh's batch axis — each chip
detects its share of streams in the same SPMD program — while per-stream
tracker state stays host-side and isolated, exactly like the reference.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.utils import LOGGER


class MultiStreamRunner:
    """Detect-per-frame across S streams, sharded over devices; track per stream."""

    def __init__(self, model, params, n_streams: int, frame_hw=(512, 640), channels: int = 3, conf: float = 0.15, iou: float = 0.6, max_det: int = 16, mesh=None, tracker_factory=None, dtype=None, max_nms: int = 0):
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression_parts

        self.n_streams = n_streams
        self.conf = conf
        dtype = dtype or jnp.bfloat16
        # exact top_k cost scales hard with K on TPU; 4x track capacity
        # covers the duplicate-anchor fan-in (see pipeline/fused.py)
        max_nms = max_nms or max(4 * max_det, 64)

        def device_fn(p, frames):
            x = frames.astype(dtype) / 255.0
            if frames.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            else:
                x = x[..., ::-1]
            # anchors-major parts path — skips the reference-layout transpose
            # round trip (see ops/nms.py non_max_suppression_parts)
            boxes_xywh, scores = model.predict_parts(p, x, dtype=dtype)
            return non_max_suppression_parts(boxes_xywh, scores, conf_thres=conf, iou_thres=iou, max_det=max_det, max_nms=max_nms)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            assert n_streams % mesh.devices.size == 0, "streams must divide devices"
            self._fn = jax.jit(
                device_fn,
                in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))),
                out_shardings=NamedSharding(mesh, P(axis)),
            )
            LOGGER.info(f"multi-stream: {n_streams} streams over {mesh.devices.size} devices")
        else:
            self._fn = jax.jit(device_fn)
        self.params = params
        factory = tracker_factory or _default_tracker
        self.trackers = [factory() for _ in range(n_streams)]

    def step(self, frames: np.ndarray):
        """frames: (S, H, W, C) uint8, one current frame per stream.

        Returns per-stream track lists (same dict schema as the Kalman manager).
        """
        import jax

        assert frames.shape[0] == self.n_streams
        out = self._fn(self.params, jax.device_put(frames))
        host = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for s in range(self.n_streams):
            dets = []
            valid = host["valid"][s]
            if valid.any():
                for b, sc in zip(host["boxes"][s][valid], host["scores"][s][valid]):
                    if sc > self.conf:
                        dets.append([b[0], b[1], b[2], b[3], sc])
            results.append(self.trackers[s].update(dets))
        return results

    def run(self, stream_iters, max_steps: int | None = None):
        """Drive from an iterable of per-stream frame iterators until exhaustion."""
        stream_iters = list(stream_iters)  # a generator would be consumed by the 1st pass
        step = 0
        while max_steps is None or step < max_steps:
            frames = []
            for it in stream_iters:
                try:
                    frames.append(next(it))
                except StopIteration:
                    return step
            yield self.step(np.stack(frames))
            step += 1
        return step


def _default_tracker():
    from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker

    return EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
