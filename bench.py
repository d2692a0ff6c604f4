#!/usr/bin/env python3
"""Benchmark: fps/chip on 640×512 IR detect+track (driver headline metric).

Pipeline measured = the BASELINE.json config 4: batched fused device program
(normalize → yolov8-small(P2) forward → DFL decode → NMS) + host
EnhancedMultiTargetTracker (max_lost_frames=150, min_hits=1, iou_threshold=0.1)
over a 3612-frame synthetic IR clip, double-buffered so host tracking overlaps
device compute.

Baseline: the reference's best recorded detect+track throughput is 65.8 fps on
its dev GPU (ref: camera_motion_compensation/test_results/
motion_compensation_v1_comparison_report.txt:16-19).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 65.8  # reference feature_matching tracker fps (GPU)


def make_clip(n_frames: int, h: int = 512, w: int = 640, seed: int = 0):
    """Synthetic IR clip: dim noise background + 2 moving bright small targets.

    Generated as uint8 batches on host (stands in for decoded video frames).
    """
    rng = np.random.default_rng(seed)
    base = rng.normal(26, 6, (h, w)).clip(0, 255).astype(np.uint8)
    frames = np.broadcast_to(base[None], (n_frames, h, w)).copy()
    for f in range(n_frames):
        # target A crosses left→right with a cloud-occlusion gap
        if not (1200 <= f < 1500):
            cx, cy = int(40 + 0.15 * f) % w, 200 + int(10 * np.sin(f / 120))
            frames[f, max(cy - 4, 0) : cy + 4, max(cx - 6, 0) : cx + 6] = 230
        # target B drifts down-right
        cx2, cy2 = (520 + int(0.02 * f)) % w, (90 + int(0.05 * f)) % h
        frames[f, max(cy2 - 3, 0) : cy2 + 3, max(cx2 - 4, 0) : cx2 + 4] = 210
    return frames[..., None].repeat(3, -1)  # HWC3 like a video decode


def main():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.ops.nms import non_max_suppression

    n_frames = int(os.getenv("BENCH_FRAMES", "3612"))
    batch = int(os.getenv("BENCH_BATCH", "128"))
    h, w = 512, 640
    conf_thres, iou_thres, max_det = 0.15, 0.6, 32

    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))  # numpy on host
    params = jax.device_put(params)  # one upload
    dtype = jnp.bfloat16

    @jax.jit
    def device_step(p, imgs):
        # IR frames are single-channel: upload (B, H, W, 1) uint8 and broadcast
        # to the 3-channel model input on device — the host→device link is the
        # pipeline bottleneck, so every byte counts.
        x = imgs.astype(dtype) / 255.0
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        preds = model.predict(p, x, dtype=dtype)
        return non_max_suppression(preds, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det, max_nms=256)

    clip = make_clip(n_frames, h, w)[..., :1]  # grayscale transport (IR video)
    n_batches = n_frames // batch
    frames_used = n_batches * batch

    # warmup / compile
    warm = device_step(params, jnp.asarray(clip[:batch]))
    jax.block_until_ready(warm)

    tracker = EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    # silence tracker prints during timing
    import contextlib, io

    # NOTE: a deep in-flight pipeline hurts here — the host<->device link
    # serializes, so queueing extra uploads delays the readback of the batch
    # the tracker is waiting on. One batch in flight is optimal on this link.
    t0 = time.perf_counter()
    sink = io.StringIO()
    with contextlib.redirect_stdout(sink):
        for bi in range(n_batches):
            dev = jax.device_put(clip[bi * batch : (bi + 1) * batch])
            out = device_step(params, dev)
            host = {k: np.asarray(v) for k, v in out.items()}
            _track(host, tracker, batch, conf_thres)
    dt = time.perf_counter() - t0
    fps = frames_used / dt

    print(
        json.dumps(
            {
                "metric": "detect+track fps/chip @640x512 IR (yolov8-small P2, batch %d)" % batch,
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


def _track(host_out, tracker, batch, conf_thres):
    for i in range(batch):
        valid = host_out["valid"][i]
        dets = []
        if valid.any():
            boxes = host_out["boxes"][i][valid]
            scores = host_out["scores"][i][valid]
            for b, s in zip(boxes, scores):
                if s > conf_thres:
                    dets.append([b[0], b[1], b[2], b[3], s])
        tracker.update(dets)


if __name__ == "__main__":
    main()
