#!/usr/bin/env python3
"""BASELINE config 5: motion-compensated tracking benchmark (VERDICT r4 next#4).

The reference's ONLY directly recorded fps baselines are exactly this path —
43.7 / 65.8 / 52.7 fps for optical_flow / feature_matching / hybrid on its dev
GPU over a 649-frame 640×512 clip (ref: camera_motion_compensation/
test_results/motion_compensation_v1_comparison_report.txt:10-25). This script
runs the SAME three methods through yolo_tpu.motion.compare over a synthetic
649-frame 640×512 IR clip with real camera pans (a moving crop window over a
larger background, so the LK/ORB motion detectors see genuine global motion)
plus target occlusion gaps, detector = the fused yolov8-small(P2) program on
the chip, and writes demos/artifacts/motion_comp_r5.txt in the reference
report's shape.

Honest split (the transport-ceiling pattern): this pipeline is per-frame and
three-legged — device detect (pays one tunnel dispatch RTT per frame in this
environment; on a local-attached chip that cost shrinks by orders of
magnitude), host cv2 global-motion detection (the reference's is host cv2
too), and host numpy Kalman tracking. Per-method fps plus the per-leg ms are
all recorded so the environmental share is quantified, not hidden.

Usage: python demos/motion_comp_bench.py [--frames 649] [--out PATH]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_FPS = {"optical_flow": 43.7, "feature_matching": 65.8, "hybrid": 52.7}


def make_panning_clip(n_frames: int, w: int = 640, h: int = 512, seed: int = 7,
                      visible: int = 10, occluded: int = 50):
    """649-frame IR clip with CAMERA MOTION: the frame is a crop window
    drifting over a 2x background (smooth pan + two abrupt jumps that should
    trigger global resets), one moving target with periodic cloud occlusions
    (the reference demo's detect/coast regime)."""
    import cv2

    rng = np.random.default_rng(seed)
    H2, W2 = h * 2, w * 2
    bg = cv2.resize(rng.normal(30, 10, (H2 // 16, W2 // 16)).astype(np.float32),
                    (W2, H2), interpolation=cv2.INTER_CUBIC)
    # mid-frequency texture octaves: the LK/ORB motion detectors need
    # trackable features — a pure low-pass IR background gives
    # goodFeaturesToTrack/ORB nothing and NO method ever fires (measured:
    # 0 events without these, 2 events = both camera bumps with them)
    bg += cv2.resize(rng.normal(0, 12, (H2 // 4, W2 // 4)).astype(np.float32),
                     (W2, H2), interpolation=cv2.INTER_CUBIC)
    gy, gx = np.mgrid[0:H2, 0:W2]
    bg += 25 * np.cos(gy / 37.0) * np.sin(gx / 53.0)
    frames = np.empty((n_frames, h, w), np.uint8)
    cycle = visible + occluded
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(n_frames):
        # smooth pan + two abrupt jumps (camera bumps) at 1/3 and 2/3
        ox = int(w / 2 + (w / 3) * np.sin(f / 90)) + (80 if f >= n_frames // 3 else 0)
        oy = int(h / 2 + (h / 4) * np.cos(f / 130)) + (60 if f >= 2 * n_frames // 3 else 0)
        ox = int(np.clip(ox, 0, W2 - w))
        oy = int(np.clip(oy, 0, H2 - h))
        img = bg[oy : oy + h, ox : ox + w] + rng.normal(0, 2, (h, w))
        # target moves in WORLD coordinates; project into the current window
        tx = W2 / 2 + 300 * np.sin(f / 200)
        ty = H2 / 2 + 150 * np.cos(f / 260)
        cx, cy = tx - ox, ty - oy
        if (f % cycle) < visible and 10 < cx < w - 10 and 10 < cy < h - 10:
            img = img + 170 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 4.0 ** 2)))
        frames[f] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def build_detector(conf: float = 0.15, iou: float = 0.6):
    """Jitted single-frame detect (fused forward + NMS) returning the
    [[x1,y1,x2,y2,conf], ...] list the tracker consumes, plus a timer box."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.ops.nms import non_max_suppression_parts

    best = Path(__file__).parent / "artifacts" / "train" / "weights" / "best.npz"
    if best.exists():
        from yolo_tpu import YOLO

        y = YOLO(str(best))
        model, params = y.model, y.params
    else:
        model = DetectionModel("yolov8-small.yaml", nc=1)
        params = model.init(0)
    params = model.fuse(params)
    ch = int(np.asarray(params["model"]["0"]["conv"]["weight"]).shape[2])  # stem input channels

    @jax.jit
    def det1(p, frame):  # (H, W) uint8 gray
        x = frame[None, ..., None].astype(jnp.bfloat16) / 255.0
        b, s = model.predict_parts(p, jnp.broadcast_to(x, x.shape[:3] + (ch,)), dtype=jnp.bfloat16)
        return non_max_suppression_parts(b, s, conf_thres=conf, iou_thres=iou, max_det=16)

    timer = {"device_ms": 0.0, "n": 0}

    def detector(frame):
        if frame.ndim == 3:  # cv2 BGR frame → gray
            frame = frame[..., 0]
        t0 = time.perf_counter()
        out = det1(params, jnp.asarray(frame))
        boxes = np.asarray(out["boxes"][0])
        scores = np.asarray(out["scores"][0])
        valid = np.asarray(out["valid"][0])
        timer["device_ms"] += (time.perf_counter() - t0) * 1e3
        timer["n"] += 1
        return [[*b.tolist(), float(s)] for b, s, v in zip(boxes, scores, valid) if v]

    # warm (compile) outside any timed window
    detector(np.zeros((512, 640), np.uint8))
    timer["device_ms"], timer["n"] = 0.0, 0
    return detector, timer


def build_batch_detector(conf: float = 0.15, iou: float = 0.6, chunk: int = 128):
    """Chunked detect pass over a whole clip — detection is tracking-
    independent, so the deployment-shaped pipeline batches it through ONE
    jitted program per chunk (amortizing the per-dispatch tunnel RTT ~100x)
    and feeds the per-frame host motion/Kalman loop from the results.
    Returns (per-frame det lists, device seconds total)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.ops.nms import non_max_suppression_parts

    best = Path(__file__).parent / "artifacts" / "train" / "weights" / "best.npz"
    if best.exists():
        from yolo_tpu import YOLO

        y = YOLO(str(best))
        model, params = y.model, y.params
    else:
        model = DetectionModel("yolov8-small.yaml", nc=1)
        params = model.init(0)
    params = model.fuse(params)
    ch = int(np.asarray(params["model"]["0"]["conv"]["weight"]).shape[2])
    params = jax.device_put(params)

    @jax.jit
    def detN(p, frames):  # (T, H, W) uint8 gray
        x = frames[..., None].astype(jnp.bfloat16) / 255.0
        b, s = model.predict_parts(p, jnp.broadcast_to(x, x.shape[:3] + (ch,)), dtype=jnp.bfloat16)
        return non_max_suppression_parts(b, s, conf_thres=conf, iou_thres=iou, max_det=16)

    def run(clip_gray):
        n = len(clip_gray)
        pad = (-n) % chunk
        cp = np.concatenate([clip_gray, np.zeros((pad,) + clip_gray.shape[1:], np.uint8)]) if pad else clip_gray
        out0 = detN(params, jnp.asarray(cp[:chunk]))  # warm/compile
        _ = np.asarray(out0["boxes"][0, 0])
        t0 = time.perf_counter()
        outs = [detN(params, jnp.asarray(cp[i : i + chunk])) for i in range(0, len(cp), chunk)]
        boxes = np.concatenate([np.asarray(o["boxes"]) for o in outs])[:n]
        scores = np.concatenate([np.asarray(o["scores"]) for o in outs])[:n]
        valid = np.concatenate([np.asarray(o["valid"]) for o in outs])[:n]
        dev_s = time.perf_counter() - t0
        dets = [
            [[*b.tolist(), float(s)] for b, s, v in zip(boxes[f], scores[f], valid[f]) if v]
            for f in range(n)
        ]
        return dets, dev_s

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=int(os.getenv("BENCH_MOTION_FRAMES", "649")))
    ap.add_argument("--out", default=str(Path(__file__).parent / "artifacts" / "motion_comp_r5.txt"))
    args = ap.parse_args()

    from yolo_tpu.motion.compare import METHODS
    from yolo_tpu.motion.motion_compensated_tracker import MotionCompensatedMultiTracker

    clip = make_panning_clip(args.frames)
    detector, timer = build_detector()

    import contextlib
    import io

    # batched detect pass (deployment shape): detections are identical for
    # every method — detection never depends on tracking state
    batch_run = build_batch_detector()
    pre_dets, batch_dev_s = batch_run(clip)
    batch_dev_ms = batch_dev_s / args.frames * 1e3

    results = {}
    for method in METHODS:
        tracker = MotionCompensatedMultiTracker(
            max_lost_frames=150, min_hits=1, iou_threshold=0.1, motion_detection_method=method
        )
        timer["device_ms"], timer["n"] = 0.0, 0
        t_motion = t_track = 0.0
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            for f in range(args.frames):
                frame = clip[f]
                dets = detector(frame)
                t1 = time.perf_counter()
                tracker.update(dets, np.repeat(frame[..., None], 3, axis=-1))
                t_track += time.perf_counter() - t1
        dt = time.perf_counter() - t0
        stats = tracker.get_comprehensive_stats()
        # batched-detect leg: re-run the host loop on precomputed detections
        tracker_b = MotionCompensatedMultiTracker(
            max_lost_frames=150, min_hits=1, iou_threshold=0.1, motion_detection_method=method
        )
        tb0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            for f in range(args.frames):
                tracker_b.update(pre_dets[f], np.repeat(clip[f][..., None], 3, axis=-1))
        host_b_s = time.perf_counter() - tb0
        fps_batched = args.frames / (batch_dev_s + host_b_s)
        results[method] = {
            "fps_batched": fps_batched,
            "batched_device_ms_per_frame": batch_dev_ms,
            "batched_host_ms_per_frame": host_b_s / args.frames * 1e3,
            "vs_ref_batched": fps_batched / REF_FPS[method],
            "frames": args.frames,
            "fps": args.frames / dt,
            "ms_per_frame": dt / args.frames * 1e3,
            "device_ms_per_frame": timer["device_ms"] / max(timer["n"], 1),
            "host_ms_per_frame": t_track / args.frames * 1e3,  # motion detect + tracker
            "global_motion_events": stats["basic"]["global_motion_events"],
            "global_resets": stats["basic"]["global_resets"],
            "individual_resets": stats["basic"]["individual_resets"],
            "vs_ref": args.frames / dt / REF_FPS[method],
        }
        r = results[method]
        print(f"{method}: BATCHED-DETECT {r['fps_batched']:.1f} fps "
              f"({r['batched_device_ms_per_frame']:.2f} dev + {r['batched_host_ms_per_frame']:.2f} host ms/frame) "
              f"= {r['vs_ref_batched']:.2f}x ref", flush=True)
        print(f"{method}: per-frame-dispatch {r['fps']:.1f} fps ({r['ms_per_frame']:.2f} ms/frame = "
              f"{r['device_ms_per_frame']:.2f} device+tunnel + {r['host_ms_per_frame']:.2f} host cv2/numpy) "
              f"| {r['global_resets']} global / {r['individual_resets']} individual resets "
              f"| {r['vs_ref']:.2f}x ref {REF_FPS[method]}", flush=True)

    recommended = max(results, key=lambda m: results[m]["fps_batched"])
    lines = [
        "Motion-compensated tracking benchmark (BASELINE config 5) — r5",
        "=" * 64,
        f"clip: {args.frames} frames 640x512 IR, camera pan + 2 jumps, 10/50 visible/occluded cycle",
        "detector: fused yolov8-small(P2) forward+NMS on TPU, conf=0.15 iou=0.6, per-frame dispatch",
        "reference: 43.7 / 65.8 / 52.7 fps (optical_flow / feature_matching / hybrid),",
        "  649-frame 640x512 clip on the reference's dev GPU (camera_motion_compensation/",
        "  test_results/motion_compensation_v1_comparison_report.txt:10-25)",
        "NOTE each frame pays one device dispatch RTT through this environment's serialized",
        "dev tunnel (device_ms below ~= RTT-bound, not compute: the same forward runs at",
        "5700+ fps chunked); the cv2 global-motion detector and numpy tracker are host-side",
        "by design, like the reference's.",
        "",
    ]
    for method, r in results.items():
        lines += [
            f"[{method}]",
            f"  frames processed : {r['frames']}",
            f"  throughput       : {r['fps_batched']:.1f} FPS batched-detect "
            f"({r['batched_device_ms_per_frame']:.2f} dev + {r['batched_host_ms_per_frame']:.2f} host ms/frame; "
            f"chunked fused detect amortizes the dispatch RTT — the deployment shape)",
            f"  vs reference     : {r['vs_ref_batched']:.2f}x ({REF_FPS[method]} fps) [batched]",
            f"  per-frame-dispatch control: {r['fps']:.1f} FPS ({r['ms_per_frame']:.2f} ms/frame)",
            f"    device detect  : {r['device_ms_per_frame']:.2f} ms/frame (incl. tunnel RTT)",
            f"    host motion+KF : {r['host_ms_per_frame']:.2f} ms/frame",
            f"  motion events    : {r['global_motion_events']}",
            f"  global resets    : {r['global_resets']}",
            f"  individual resets: {r['individual_resets']}",
            f"  vs reference     : {r['vs_ref']:.2f}x ({REF_FPS[method]} fps)",
            "",
        ]
    lines.append(f"Recommended method: {recommended} (highest throughput)")
    lines.append("")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")
    import json

    print(json.dumps({m: {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items() if k != "motion_detection"} for m, r in results.items()}))


if __name__ == "__main__":
    main()
