"""Python client for the TPU serving daemon.

TPU-native counterpart of the reference's remote-inference clients
(examples/YOLO11-Triton-CPP + utils/triton.py TritonRemoteModel): a
yolo_tpu.serve.DetectionServer owns the jitted model on the TPU host; this
client streams video frames to it from any machine and draws the returned
detections. Two usage levels are shown:

  - low level: utils.remote.RemoteModel — frame in, (n, 6) detections out
  - facade:   YOLO("tcp://host:port/0").predict/track — full Results surface

Start a server first:  python -m yolo_tpu.serve --model best.npz --port 8777

Usage:
    python examples/remote_client.py --url tcp://127.0.0.1:8777/0 \
        --source video.mp4 [--save out.mp4] [--max-frames N] [--track]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import cv2

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import YOLO  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", required=True, help="tcp://host:port/<model_id>")
    ap.add_argument("--source", required=True, help="video/image path or webcam index")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--track", action="store_true", help="attach MOT track ids client-side")
    ap.add_argument("--save", default=None, help="annotated output video path")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    model = YOLO(args.url)
    run = model.track if args.track else model.predict
    writer = None
    n, t0 = 0, time.perf_counter()
    for r in run(args.source, conf=args.conf, stream=True, verbose=False):
        n += 1
        if args.save:
            im = r.plot()
            if writer is None:
                h, w = im.shape[:2]
                writer = cv2.VideoWriter(args.save, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
            writer.write(im)
        if args.max_frames and n >= args.max_frames:
            break
    dt = time.perf_counter() - t0
    if writer is not None:
        writer.release()
        print(f"saved {args.save}")
    print(f"{n} frames in {dt:.2f}s ({n / max(dt, 1e-9):.1f} fps over the wire)")
    return n


if __name__ == "__main__":
    main()
