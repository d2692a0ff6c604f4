#!/usr/bin/env python3
"""Zero-shot action recognition over tracked people.

TPU-native counterpart of the reference example
(ref: examples/YOLOv8-Action-Recognition/action_recognition.py): detect+track
people, buffer each track's crops, and label the action with a zero-shot
video classifier. The reference's HuggingFace/XCLIP path maps here to the
framework's NATIVE CLIP towers (yolo_tpu.nn.text_model): each candidate label
is embedded once by the text tower, every track's recent crops are embedded by
the vision tower, and the per-track scores are cosine similarities averaged
over the crop buffer (frame-mean video embedding).

Pass --clip-ckpt with a real CLIP .pt for meaningful labels; without weights
the pipeline still runs end to end (random towers) and says so loudly.

Usage:
    python examples/action_recognition.py --source clip.mp4 \
        --labels "walking,running,standing,waving" --clip-ckpt ViT-B-32.pt
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict, deque
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolo_tpu import YOLO
from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.plotting import Annotator, colors


class ZeroShotVideoClassifier:
    """Cosine scoring of crop sequences against text labels via native CLIP."""

    def __init__(self, labels: list[str], clip_ckpt: str | None = None, window: int = 8):
        from yolo_tpu.nn.text_model import CLIPModel

        self.clip = CLIPModel()
        if clip_ckpt:
            self.clip.load_torch(clip_ckpt)
        else:
            LOGGER.warning(
                "action recognition: no --clip-ckpt — RANDOM CLIP towers; the pipeline runs but labels are noise"
            )
        self.labels = labels
        self.text_emb = np.asarray(self.clip.encode_text([f"a person {l}" for l in labels]))  # (L, D)
        self.window = window

    def __call__(self, crops: list[np.ndarray]) -> tuple[str, float]:
        """crops: list of BGR crops (most recent last) → (label, confidence)."""
        crops = crops[-self.window :]
        ims = [c[..., ::-1] for c in crops]  # BGR→RGB
        emb = np.asarray(self.clip.encode_image(ims))  # (T, D) unit-norm
        video = emb.mean(0)
        video /= np.linalg.norm(video) + 1e-8
        sims = self.text_emb @ video
        probs = np.exp(100 * sims) / np.exp(100 * sims).sum()  # CLIP logit scale
        k = int(np.argmax(probs))
        return self.labels[k], float(probs[k])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--model", default="yolov8n.yaml")
    ap.add_argument("--labels", default="walking,running,standing,sitting,waving")
    ap.add_argument("--clip-ckpt", default=None)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--person-class", type=int, default=0, help="class id to analyze (COCO person = 0)")
    ap.add_argument("--window", type=int, default=8, help="crops per track fed to the classifier")
    ap.add_argument("--out", default="action_recognition_output.mp4")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    labels = [l.strip() for l in args.labels.split(",") if l.strip()]
    clf = ZeroShotVideoClassifier(labels, args.clip_ckpt, window=args.window)
    model = YOLO(args.model)

    buffers: dict[int, deque] = defaultdict(lambda: deque(maxlen=args.window))
    actions: dict[int, tuple[str, float]] = {}
    writer = None
    n = 0
    for r in model.track(args.source, stream=True, conf=args.conf, persist=True, verbose=False):
        frame = r.orig_img.copy()
        ann = Annotator(frame)
        boxes = r.boxes
        ids = boxes.id if boxes.id is not None else [None] * len(boxes)
        for b, tid, c in zip(boxes.xyxy, ids, boxes.cls):
            if tid is None or int(c) != args.person_class:
                continue
            x1, y1, x2, y2 = (max(int(v), 0) for v in b)
            crop = frame[y1:y2, x1:x2]
            if crop.size:
                buffers[int(tid)].append(crop)
            if len(buffers[int(tid)]) >= min(2, args.window) and n % args.window == 0:
                actions[int(tid)] = clf(list(buffers[int(tid)]))
            label, p = actions.get(int(tid), ("...", 0.0))
            ann.box_label(b, f"#{int(tid)} {label} {p:.2f}", colors(int(tid), True))
        if writer is None:
            writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 30, (frame.shape[1], frame.shape[0]))
        writer.write(frame)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    if writer is not None:
        writer.release()
    LOGGER.info(f"wrote {args.out} ({n} frames, {len(actions)} labeled tracks)")
    return actions, n


if __name__ == "__main__":
    main()
