"""Fused detect+track: one XLA program per video chunk.

The TPU-native end-game of the fork's pipeline (SURVEY §7: "batch frames per
step and scan the Kalman update over time with state carried across steps"):

    frames (T, H, W, C) uint8
      → normalize → yolov8-small(P2) forward → DFL decode → NMS   [batch-parallel]
      → lax.scan(batched Kalman tracker step) over the T frames   [sequential]
      → per-frame track table outputs (tiny)

Per chunk the host does ONE upload and ONE tiny download; detection batches
across frames while tracking scans them, inside the same jit. Track state is a
pytree carried across chunks, so clips of any length stream chunk-by-chunk.

Tracking semantics = yolo_tpu.kalman.batched (itself output-parity-tested
against the reference's EnhancedMultiTargetTracker).
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.kalman.batched import STATUS_DETECTED, STATUS_NONE, STATUS_PREDICTED, init_state, make_step


class FusedDetectTrack:
    """Chunked fused detect+track over a fixed frame geometry."""

    def __init__(
        self,
        model,
        params,
        frame_hw=(512, 640),
        channels: int = 1,
        chunk: int = 128,
        conf: float = 0.15,
        iou: float = 0.6,
        max_lost_frames: int = 150,
        min_hits: int = 1,
        iou_threshold: float = 0.1,
        n_max: int = 64,
        d_max: int = 16,
        dtype=None,
    ):
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression

        self.chunk = chunk
        self.d_max = d_max
        self.n_max = n_max
        self.conf = conf
        dtype = dtype or jnp.bfloat16
        tracker_step = make_step(n_max, d_max, max_lost_frames, min_hits, iou_threshold)

        def fused(p, track_state, frames):
            x = frames.astype(dtype) / 255.0
            if frames.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            else:
                x = x[..., ::-1]  # BGR→RGB
            preds = model.predict(p, x, dtype=dtype)
            det = non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=d_max, max_nms=256)
            det_boxes = det["boxes"]  # (T, d_max, 4)
            det_mask = det["valid"] & (det["scores"] > conf)  # (T, d_max)

            def body(state, inp):
                boxes, mask = inp
                return tracker_step(state, boxes, mask)

            track_state, outs = jax.lax.scan(body, track_state, (det_boxes, det_mask))
            outs["det_count"] = det_mask.sum(-1)
            return track_state, outs

        self._fused = jax.jit(fused, donate_argnums=(1,))
        self.params = params
        self.state = init_state(n_max)

    def process_chunk(self, frames: np.ndarray):
        """frames: (T, H, W, C) uint8 with T == chunk → dict of per-frame outputs."""
        import jax

        assert frames.shape[0] == self.chunk, f"chunk must be {self.chunk}, got {frames.shape[0]}"
        dev = jax.device_put(frames)
        self.state, outs = self._fused(self.params, self.state, dev)
        return {k: np.asarray(v) for k, v in outs.items()}

    def run_clip(self, clip: np.ndarray, collect_stats: bool = True):
        """Stream a whole clip; returns (outputs list, contract stats).

        Stats mirror the reference demo's observable counters (ref:
        kalman/aircraft_detection_tracking.py :111-131): detection/prediction
        frame counts + state switches.
        """
        T = self.chunk
        n_chunks = len(clip) // T
        stats = {"frames": 0, "detection_frames": 0, "prediction_frames": 0, "state_changes": 0}
        all_out = []
        prev_status = None  # (N,) last frame of previous chunk
        prev_nums = None
        for ci in range(n_chunks):
            outs = self.process_chunk(clip[ci * T : (ci + 1) * T])
            all_out.append(outs)
            if not collect_stats:
                continue
            # vectorized contract-stats: slots are stable per track, so per-id
            # state transitions == per-slot status changes under the same id
            emit = outs["emit"]
            status = np.where(emit, outs["status"], STATUS_NONE)  # (T, N)
            nums = outs["track_num"]
            stats["frames"] += T
            stats["detection_frames"] += int((status == STATUS_DETECTED).sum())
            stats["prediction_frames"] += int((status == STATUS_PREDICTED).sum())
            full_status = status if prev_status is None else np.concatenate([prev_status[None], status])
            full_nums = nums if prev_nums is None else np.concatenate([prev_nums[None], nums])
            changed = (
                (full_status[1:] != full_status[:-1])
                & (full_status[1:] != STATUS_NONE)
                & (full_status[:-1] != STATUS_NONE)
                & (full_nums[1:] == full_nums[:-1])
            )
            stats["state_changes"] += int(changed.sum())
            prev_status, prev_nums = status[-1], nums[-1]
        return all_out, stats
