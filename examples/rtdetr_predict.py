"""RT-DETR inference example (NMS-free end-to-end detection on TPU).

TPU-native counterpart of the reference's RT-DETR deployment example
(examples/RTDETR-ONNXRuntime-Python/main.py): the reference exports RT-DETR to
ONNX and post-processes the (300, 4+nc) decoder output by hand — here the
RTDETR facade runs the same HGNetV2+AIFI+deformable-decoder graph as ONE jitted
XLA program (queries are already final; no NMS stage), and Results carries the
score-thresholded boxes.

Usage:
    python examples/rtdetr_predict.py --source img.jpg [--model rtdetr-l.yaml]
        [--weights rtdetr-l.pt] [--conf 0.5] [--save out.jpg]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import cv2

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import RTDETR  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="image or video path")
    ap.add_argument("--model", default="rtdetr-l.yaml", help="model yaml (random init) or checkpoint")
    ap.add_argument("--weights", default=None, help="optional .pt/.npz checkpoint overriding --model")
    ap.add_argument("--conf", type=float, default=0.5, help="score threshold (ref example uses 0.5)")
    ap.add_argument("--save", default=None, help="annotated output path")
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args(argv)

    model = RTDETR(args.weights or args.model)
    t0 = time.perf_counter()
    results = model.predict(args.source, conf=args.conf, imgsz=args.imgsz, verbose=False)
    dt = time.perf_counter() - t0
    for r in results:
        print(f"{r.path}: {len(r.boxes)} objects ({r.verbose().strip() or 'none'})")
    if args.save and results:
        cv2.imwrite(args.save, results[0].plot())
        print(f"saved {args.save}")
    print(f"{len(results)} image(s) in {dt:.2f}s (first call includes jit compile)")
    return results


if __name__ == "__main__":
    main()
