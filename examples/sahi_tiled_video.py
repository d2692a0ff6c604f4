"""Sliced (SAHI-style) video inference on TPU.

TPU-native counterpart of the reference's SAHI video example
(examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py): instead of the `sahi`
package's per-slice Python loop, the static tile grid is batched through ONE
jitted detect program per frame (ops/tiling.py), and overlapping-tile
duplicates are merged with a class-aware greedy NMS.

Usage:
    python examples/sahi_tiled_video.py --source video.mp4 --model best.npz \
        --tile 256 --overlap 0.25 [--save out.mp4] [--max-frames N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import YOLO  # noqa: E402
from yolo_tpu.ops.tiling import tiled_predict  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="video path")
    ap.add_argument("--model", default="yolov8-small.yaml")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=float, default=0.25)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--save", default=None, help="output video path")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    model = YOLO(args.model)
    cap = cv2.VideoCapture(args.source)
    writer = None
    n, t0 = 0, time.perf_counter()
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        boxes, scores, cls = tiled_predict(
            model, frame, tile=args.tile, overlap=args.overlap, conf=args.conf
        )
        for (x1, y1, x2, y2), s in zip(boxes.astype(int), scores):
            cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 1)
            cv2.putText(frame, f"{s:.2f}", (x1, max(y1 - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 255, 0), 1)
        if args.save:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.save, cv2.VideoWriter_fourcc(*"mp4v"),
                    cap.get(cv2.CAP_PROP_FPS) or 30, frame.shape[1::-1],
                )
            writer.write(frame)
        n += 1
        if n % 50 == 0:
            print(f"{n} frames, {n / (time.perf_counter() - t0):.1f} fps, last: {len(boxes)} dets")
    cap.release()
    if writer is not None:
        writer.release()
    print(f"done: {n} frames in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
