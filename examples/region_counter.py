"""Count tracked objects inside user-defined polygon regions.

TPU-native counterpart of the reference's region-counter example
(examples/YOLOv8-Region-Counter/yolov8_region_counter.py): detection+tracking
run as the usual jitted program + BYTE/BOT-SORT glue, and the per-region
point-in-polygon counting/drawing is the solutions.RegionCounter app — this
script is the CLI wrapper the reference ships as a standalone example.

Usage:
    python examples/region_counter.py --source video.mp4 [--model best.npz]
        [--regions "100,100 300,100 300,300 100,300;400,50 600,50 600,250 400,250"]
        [--save out.mp4] [--max-frames N]

Each region is a space-separated list of x,y vertices; regions are separated
by ';'. Default: two demo rectangles like the reference example.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu.solutions import RegionCounter  # noqa: E402


def parse_regions(spec: str) -> dict:
    regions = {}
    for i, poly in enumerate(spec.split(";")):
        pts = [tuple(int(v) for v in p.split(",")) for p in poly.split() if p]
        if len(pts) >= 3:
            regions[f"region-{i + 1:02d}"] = pts
    if not regions:
        raise ValueError(f"no valid regions in {spec!r}")
    return regions


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="video path / webcam index")
    ap.add_argument("--model", default="yolov8n.yaml")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument(
        "--regions",
        default="100,100 300,100 300,300 100,300;400,50 600,50 600,250 400,250",
        help="';'-separated polygons, each 'x,y x,y x,y ...'",
    )
    ap.add_argument("--save", default=None, help="annotated output video path")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    counter = RegionCounter(model=args.model, regions=parse_regions(args.regions), conf=args.conf, imgsz=args.imgsz)

    cap = cv2.VideoCapture(args.source if not str(args.source).isdigit() else int(args.source))
    writer = None
    n = 0
    counts_last: dict = {}
    while cap.isOpened():
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        out = counter.process(frame)
        counts_last = out["region_counts"]
        if args.save:
            if writer is None:
                h, w = out["im0"].shape[:2]
                writer = cv2.VideoWriter(args.save, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
            writer.write(out["im0"])
        n += 1
    cap.release()
    if writer is not None:
        writer.release()
        print(f"saved {args.save}")
    print(f"{n} frames; final region counts: {counts_last}")
    return counts_last


if __name__ == "__main__":
    main()
