"""Instance-segmentation inference example (boxes + prototype masks on TPU).

TPU-native counterpart of the reference's segmentation deployment example
(examples/YOLOv8-Segmentation-ONNXRuntime-Python/main.py): the reference runs
the exported seg ONNX graph and composes masks from the (32, 160, 160) protos
by hand — here the same decode (NMS → mask-coefficient × proto matmul → crop +
threshold) is part of the single jitted program behind the segmentation
predictor, and Results.masks holds the final binary masks (retina_masks=True
composes at native image resolution).

Usage:
    python examples/segment_predict.py --source img.jpg [--model yolov8n-seg.yaml]
        [--weights yolov8n-seg.pt] [--conf 0.25] [--save out.jpg] [--retina]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import YOLO  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="image or video path")
    ap.add_argument("--model", default="yolov8n-seg.yaml")
    ap.add_argument("--weights", default=None, help="optional .pt/.npz checkpoint overriding --model")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--retina", action="store_true", help="native-resolution masks (retina_masks)")
    ap.add_argument("--save", default=None, help="annotated output path")
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args(argv)

    model = YOLO(args.weights or args.model, task="segment")
    results = model.predict(args.source, conf=args.conf, imgsz=args.imgsz, retina_masks=args.retina, verbose=False)
    for r in results:
        n = len(r.boxes)
        area = int(np.asarray(r.masks.data).sum()) if getattr(r, "masks", None) is not None and n else 0
        print(f"{r.path}: {n} instances, {area} mask px")
    if args.save and results:
        cv2.imwrite(args.save, results[0].plot())
        print(f"saved {args.save}")
    return results


if __name__ == "__main__":
    main()
