#!/usr/bin/env python3
"""Interactive tracking UI — click an object to follow it.

TPU-native counterpart of the reference example
(ref: examples/YOLO-Interactive-Tracking-UI/interactive_tracker.py): run
detect+track over a stream, let the user click a detection to select it, and
render the selected track with a dashed highlight + center dot while all other
tracks draw dim. Esc quits, `c` clears the selection.

Headless-safe: with --no-show (or no display), frames are written to the
output video only, and --click x,y preselects the object programmatically —
which is also how the smoke test drives it.

Usage:
    python examples/interactive_tracking.py --source clip.mp4 --model yolov8n.yaml
    python examples/interactive_tracking.py --source 0 --show          # webcam UI
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import YOLO
from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.plotting import Annotator, colors


def center(b):
    return int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2)


def draw_dashed_box(img, b, color, thickness=2, dash=10):
    x1, y1, x2, y2 = (int(v) for v in b)
    for xa, ya, xb, yb in ((x1, y1, x2, y1), (x2, y1, x2, y2), (x2, y2, x1, y2), (x1, y2, x1, y1)):
        length = int(np.hypot(xb - xa, yb - ya))
        for t in range(0, length, dash * 2):
            p = np.array([xa, ya]) + (np.array([xb - xa, yb - ya]) * (t / max(length, 1))).astype(int)
            q = np.array([xa, ya]) + (np.array([xb - xa, yb - ya]) * (min(t + dash, length) / max(length, 1))).astype(int)
            cv2.line(img, tuple(p), tuple(q), color, thickness)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="0")
    ap.add_argument("--model", default="yolov8n.yaml")
    ap.add_argument("--tracker", default="bytetrack.yaml")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--iou", type=float, default=0.3)
    ap.add_argument("--out", default="interactive_tracker_output.mp4")
    ap.add_argument("--show", action="store_true", help="open the cv2 window (needs a display)")
    ap.add_argument("--click", default=None, help="x,y programmatic selection (headless demo/test)")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    model = YOLO(args.model)
    selected = {"id": None}
    click_xy = tuple(int(v) for v in args.click.split(",")) if args.click else None

    def on_mouse(event, x, y, *_):
        if event == cv2.EVENT_LBUTTONDOWN:
            selected["click"] = (x, y)

    if args.show:
        cv2.namedWindow("yolo_tpu interactive tracking")
        cv2.setMouseCallback("yolo_tpu interactive tracking", on_mouse)

    writer = None
    n = 0
    t0 = time.time()
    src = int(args.source) if str(args.source).isdigit() else args.source
    for r in model.track(src, stream=True, conf=args.conf, iou=args.iou, tracker=args.tracker, persist=True, verbose=False):
        frame = r.orig_img.copy()
        ann = Annotator(frame)
        boxes = r.boxes
        pending = selected.pop("click", None) or (click_xy if n == 0 else None)
        for b, tid, c in zip(boxes.xyxy, boxes.id if boxes.id is not None else [None] * len(boxes), boxes.cls):
            if pending is not None and tid is not None and b[0] <= pending[0] <= b[2] and b[1] <= pending[1] <= b[3]:
                selected["id"] = int(tid)
                LOGGER.info(f"selected track {int(tid)}")
            label = f"{model.names.get(int(c), int(c))} {int(tid) if tid is not None else '-'}"
            if tid is not None and selected["id"] == int(tid):
                draw_dashed_box(frame, b, (0, 255, 0), 2)
                cv2.circle(frame, center(b), 4, (0, 255, 0), -1)
                ann.text((int(b[0]), int(b[1]) - 6), f"ACTIVE {label}", (0, 255, 0))
            else:
                ann.box_label(b, label, colors(int(c), True))
        fps = (n + 1) / max(time.time() - t0, 1e-6)
        ann.text((8, 22), f"{fps:.1f} fps", (255, 255, 255))
        if writer is None:
            writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 30, (frame.shape[1], frame.shape[0]))
        writer.write(frame)
        if args.show:
            cv2.imshow("yolo_tpu interactive tracking", frame)
            k = cv2.waitKey(1) & 0xFF
            if k == 27:
                break
            if k == ord("c"):
                selected["id"] = None
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    if writer is not None:
        writer.release()
    LOGGER.info(f"wrote {args.out} ({n} frames, selected track: {selected['id']})")
    return selected["id"], n


if __name__ == "__main__":
    main()
