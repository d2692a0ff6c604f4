"""Detect + track video pipeline: YOLO detector → multi-target Kalman → overlay.

Behavioral parity with the fork's main demo (ref:
kalman/aircraft_detection_tracking.py aircraft_detection_tracking:29 —
tracker cfg (max_lost_frames=150, min_hits=1, iou_threshold=0.1) :48-52,
conf>0.1 detection filter :99-106, state-switch accounting :111-131, title
overlay :146-158), generalized to take paths/model as arguments and to batch
device inference. Returns the run statistics (the contract: detection/prediction
frame counts + state switches, cf. README.md:177-182 clip stats).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker
from yolo_tpu.kalman.visualizer import TrajectoryVisualizer
from yolo_tpu.utils import LOGGER


def aircraft_detection_tracking(
    video_path,
    model="yolov8-small.yaml",
    output_path=None,
    conf_threshold: float = 0.1,
    max_lost_frames: int = 150,
    min_hits: int = 1,
    iou_threshold: float = 0.1,
    max_frames: int | None = None,
    write_video: bool = True,
    detector=None,
) -> dict:
    """Run the IR small-target detect+track loop over a video.

    Args:
        video_path: input video file.
        model: model source for the YOLO facade (yaml/.pt/.npz), or pass
            ``detector`` — a callable frame→[[x1,y1,x2,y2,conf], ...] — directly.
        output_path: annotated video output (default: tracking_results/<name>_tracked.mp4).
        conf_threshold: detection filter (0.1 — small targets score low).
        max_lost_frames/min_hits/iou_threshold: tracker config (reference demo values).
        max_frames: optional cap for tests.
        write_video: set False to skip the VideoWriter (benchmarking).

    Returns:
        stats dict: frames, detection_frames, prediction_frames, state_changes,
        tracker statistics.
    """
    import cv2

    video_path = str(video_path)
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"video not found: {video_path}")

    if detector is None:
        from yolo_tpu import YOLO

        yolo = YOLO(model)
        yolo.fuse()

        def detector(frame):
            results = yolo.predict(frame, conf=conf_threshold, verbose=False)
            dets = []
            if len(results) > 0 and results[0].boxes is not None:
                boxes = results[0].boxes.xyxy
                scores = results[0].boxes.conf
                for box, score in zip(boxes, scores):
                    if score > conf_threshold:
                        dets.append([box[0], box[1], box[2], box[3], score])
            return dets

    tracker = EnhancedMultiTargetTracker(
        max_lost_frames=max_lost_frames, min_hits=min_hits, iou_threshold=iou_threshold
    )
    visualizer = TrajectoryVisualizer()

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video: {video_path}")
    fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    total_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    LOGGER.info(f"video: {width}x{height}, {fps}fps, {total_frames} frames")

    out = None
    if write_video:
        if output_path is None:
            output_path = Path("tracking_results") / f"{Path(video_path).stem}_tracked.mp4"
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        out = cv2.VideoWriter(str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height))

    frame_count = 0
    detection_frames = 0
    prediction_frames = 0
    state_changes = 0
    last_states: dict = {}

    while True:
        ret, frame = cap.read()
        if not ret or (max_frames and frame_count >= max_frames):
            break
        frame_count += 1

        detections = detector(frame)
        tracks = tracker.update(detections)

        # state-switch accounting (contract stats, ref :111-131)
        current_states = {}
        for track in tracks:
            tid, status = track["track_id"], track["status"]
            current_states[tid] = status
            if tid in last_states and last_states[tid] != status:
                state_changes += 1
                print(f"frame {frame_count}: target {tid} {last_states[tid]} -> {status}")
            if status == "detected":
                detection_frames += 1
            elif status == "predicted":
                prediction_frames += 1
        last_states = current_states.copy()

        if out is not None:
            frame_info = {
                "frame_number": frame_count,
                "detections": len(detections),
                "tracks": len(tracks),
                "detection_frames": detection_frames,
                "prediction_frames": prediction_frames,
                "state_changes": state_changes,
            }
            vis = visualizer.draw_tracks(frame, tracks, detections, frame_info)
            if any(t["status"] == "predicted" for t in tracks):
                title, color = "AI PREDICTION MODE - Orange Boxes", (0, 165, 255)
            elif any(t["status"] == "detected" for t in tracks):
                title, color = "DETECTION MODE - Green Boxes", (0, 255, 0)
            else:
                title, color = "NO TARGETS", (255, 255, 255)
            cv2.putText(vis, title, (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1.0, color, 3)
            out.write(vis)

        if frame_count % 50 == 0:
            pct = frame_count / max(total_frames, 1) * 100
            print(f"progress: {pct:.1f}% ({frame_count}/{total_frames})")
            print(f"  detection frames: {detection_frames}, prediction frames: {prediction_frames}")
            print(f"  state changes: {state_changes}")

    cap.release()
    if out is not None:
        out.release()
        LOGGER.info(f"wrote {output_path}")

    stats = {
        "frames": frame_count,
        "detection_frames": detection_frames,
        "prediction_frames": prediction_frames,
        "state_changes": state_changes,
        "tracker": tracker.get_statistics(),
    }
    total_states = detection_frames + prediction_frames
    if total_states:
        print(
            f"done: {frame_count} frames; detected {detection_frames} "
            f"({100 * detection_frames / total_states:.1f}%) / predicted {prediction_frames} "
            f"({100 * prediction_frames / total_states:.1f}%); {state_changes} state switches"
        )
    return stats
