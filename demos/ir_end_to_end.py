#!/usr/bin/env python3
"""End-to-end IR demo: train yolov8-small(P2) on synthetic IR data, then run the
fused detect+track pipeline with the trained weights on an occlusion clip.

Reproduces the reference's headline behavior (ref: README.md:177-182 — 3612
frames, detected/predicted split, state switches) with everything TPU-native.
Outputs: demos/artifacts/{best.npz, results.csv, demo_report.json}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path(__file__).parent / "artifacts"


def make_dataset(root: Path, n_train: int = 64, w: int = 640, h: int = 512, seed: int = 0):
    """Synthetic IR set: smooth cloudy background + 1-3 small bright aircraft blobs."""
    import cv2

    rng = np.random.default_rng(seed)
    (root / "images/train").mkdir(parents=True, exist_ok=True)
    (root / "labels/train").mkdir(parents=True, exist_ok=True)
    for i in range(n_train):
        bg = rng.normal(30, 10, (h // 16, w // 16)).astype(np.float32)
        img = cv2.resize(bg, (w, h), interpolation=cv2.INTER_CUBIC)
        img += rng.normal(0, 2, (h, w))
        lines = []
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.uniform(0.08, 0.92), rng.uniform(0.08, 0.92)
            r = rng.uniform(2.5, 6.0)  # tiny target
            amp = rng.uniform(120, 200)
            yy, xx = np.mgrid[0:h, 0:w]
            img += amp * np.exp(-(((xx - cx * w) ** 2 + (yy - cy * h) ** 2) / (2 * r**2)))
            bw, bh = (4 * r) / w, (4 * r) / h
            lines.append(f"0 {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        cv2.imwrite(str(root / f"images/train/{i}.png"), np.clip(img, 0, 255).astype(np.uint8))
        (root / f"labels/train/{i}.txt").write_text("\n".join(lines) + "\n")
    (root / "dataset.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: aircraft\n")
    return root / "dataset.yaml"


def make_clip(n_frames: int, w: int = 640, h: int = 512, seed: int = 7):
    """Moving target over the same background statistics, with an occlusion gap."""
    import cv2

    rng = np.random.default_rng(seed)
    bg = cv2.resize(rng.normal(30, 10, (h // 16, w // 16)).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC)
    frames = np.empty((n_frames, h, w, 1), np.uint8)
    gap = (int(n_frames * 0.33), int(n_frames * 0.41))  # ~8% occlusion window
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(n_frames):
        img = bg + rng.normal(0, 2, (h, w))
        cx = 40 + (w - 80) * (f / n_frames)
        cy = h / 2 + 60 * np.sin(f / 90)
        if not (gap[0] <= f < gap[1]):
            img = img + 170 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 4.0**2)))
        frames[f, :, :, 0] = np.clip(img, 0, 255).astype(np.uint8)
    return frames, gap


def main():
    from yolo_tpu import YOLO
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    OUT.mkdir(parents=True, exist_ok=True)
    ds_root = Path(os.getenv("DEMO_DS", "/tmp/ir_demo_ds"))
    data = make_dataset(ds_root, n_train=int(os.getenv("DEMO_TRAIN_IMAGES", "64")))

    # 1) train the P2 small-target model with the IR recipe (shortened)
    model = YOLO("yolov8-small.yaml")
    t0 = time.time()
    metrics = model.train(
        data=str(data), epochs=int(os.getenv("DEMO_EPOCHS", "30")), imgsz=640, batch=8, workers=4,
        optimizer="AdamW", lr0=0.002, lrf=0.01, warmup_epochs=2,
        hsv_h=0.0, hsv_s=0.0, hsv_v=0.3, degrees=0.0, translate=0.05, scale=0.2,
        mosaic=0.3, copy_paste=0.0, close_mosaic=5, fliplr=0.5, flipud=0.1,
        conf=0.15, iou=0.6, project=str(OUT), name="train", exist_ok=True, amp=True, patience=100,
    )
    train_time = time.time() - t0
    print(f"TRAIN DONE in {train_time/60:.1f} min: {metrics}")

    # 2) fused detect+track on an occlusion clip with the trained weights
    det_model = model.model
    params = det_model.fuse(model.params)
    n_frames = int(os.getenv("DEMO_FRAMES", "1024"))
    clip, gap = make_clip(n_frames)
    ft = FusedDetectTrack(det_model, params, frame_hw=(512, 640), channels=1, chunk=128,
                          conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    ft.process_chunk(clip[:128])  # compile
    ft.reset()  # clear both track state and the on-device stats accumulator
    n_used = (n_frames // 128) * 128
    t0 = time.time()
    _, stats = ft.run_clip(clip[:n_used])
    fps = n_used / (time.time() - t0)

    report = {
        "train_metrics": metrics,
        "train_minutes": round(train_time / 60, 2),
        "clip_frames": n_used,
        "occlusion_window": list(gap),
        "track_stats": stats,
        "detect_track_fps": round(fps, 1),
    }
    (OUT / "demo_report.json").write_text(json.dumps(report, indent=2, default=float))
    print(json.dumps(report, indent=2, default=float))
    assert metrics["mAP50"] > 0.5, "detector failed to learn the synthetic IR targets"
    assert stats["detection_frames"] > 0 and stats["prediction_frames"] > 0, "tracking must coast the occlusion"
    print("IR END-TO-END DEMO OK")


if __name__ == "__main__":
    main()
