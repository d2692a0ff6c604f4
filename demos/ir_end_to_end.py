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


def _write_split(root: Path, split: str, n: int, w: int, h: int, seed: int,
                 amp=(120.0, 200.0), radius=(2.5, 6.0), n_targets=(1, 4), distractors: int = 0):
    """Synthetic IR split. Defaults reproduce the training distribution; the
    knobs exist for HARD evaluation fixtures (tests/test_val_parity.py
    flagship test needs the reference validator's mAP50-95 in the 0.6-0.9
    band where NMS/matching divergences actually show): lower `amp` pushes
    targets toward the background noise floor, smaller `radius` shrinks them
    below the P2 cell, `distractors` adds unlabeled dim clutter blobs."""
    import cv2

    rng = np.random.default_rng(seed)
    (root / f"images/{split}").mkdir(parents=True, exist_ok=True)
    (root / f"labels/{split}").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        bg = rng.normal(30, 10, (h // 16, w // 16)).astype(np.float32)
        img = cv2.resize(bg, (w, h), interpolation=cv2.INTER_CUBIC)
        img += rng.normal(0, 2, (h, w))
        yy, xx = np.mgrid[0:h, 0:w]
        lines = []
        for _ in range(rng.integers(*n_targets)):
            cx, cy = rng.uniform(0.08, 0.92), rng.uniform(0.08, 0.92)
            r = rng.uniform(*radius)  # tiny target
            a = rng.uniform(*amp)
            img += a * np.exp(-(((xx - cx * w) ** 2 + (yy - cy * h) ** 2) / (2 * r**2)))
            bw, bh = (4 * r) / w, (4 * r) / h
            lines.append(f"0 {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        for _ in range(distractors):  # unlabeled clutter below the target band
            cx, cy = rng.uniform(0.05, 0.95), rng.uniform(0.05, 0.95)
            r = rng.uniform(3.0, 10.0)
            img += rng.uniform(15, 40) * np.exp(-(((xx - cx * w) ** 2 + (yy - cy * h) ** 2) / (2 * r**2)))
        cv2.imwrite(str(root / f"images/{split}/{i}.png"), np.clip(img, 0, 255).astype(np.uint8))
        (root / f"labels/{split}/{i}.txt").write_text("\n".join(lines) + "\n")


def make_dataset(root: Path, n_train: int = 64, n_val: int = 32, w: int = 640, h: int = 512, seed: int = 0):
    """Synthetic IR set: smooth cloudy background + 1-3 small bright aircraft
    blobs. Train and a HELD-OUT val split from disjoint seeds — the reported
    mAP is generalization, not memorization (the reference's 0.9944 is a real
    val split, ref small_target_detection/yolov8_small_aircraft/results.csv)."""
    _write_split(root, "train", n_train, w, h, seed)
    _write_split(root, "val", n_val, w, h, seed + 10_000)
    (root / "dataset.yaml").write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n  0: aircraft\n"
    )
    return root / "dataset.yaml"


def make_clip(n_frames: int, w: int = 640, h: int = 512, seed: int = 7,
              visible: int = 10, occluded: int = 50):
    """Single moving target with PERIODIC cloud occlusions.

    The reference demo clip's profile (ref README.md:177-182): 3612 frames,
    600 detected (16.6%) / 3000 predicted (83.4%), 119 state switches — i.e.
    short detection bursts between long coasting stretches. A repeating
    10-visible / 50-occluded cycle reproduces that regime: ~n/60 cycles, two
    detected↔predicted switches per cycle, ~n/6 detected frames.
    """
    import cv2

    rng = np.random.default_rng(seed)
    bg = cv2.resize(rng.normal(30, 10, (h // 16, w // 16)).astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC)
    frames = np.empty((n_frames, h, w, 1), np.uint8)
    cycle = visible + occluded
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(n_frames):
        img = bg + rng.normal(0, 2, (h, w))
        # slow crossing + weave, bounded inside the frame for the whole clip
        cx = 40 + (w - 80) * (0.5 + 0.5 * np.sin(f / 700))
        cy = h / 2 + 100 * np.sin(f / 160)
        if (f % cycle) < visible:
            img = img + 170 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 4.0**2)))
        frames[f, :, :, 0] = np.clip(img, 0, 255).astype(np.uint8)
    return frames, {"cycle_visible": visible, "cycle_occluded": occluded}


def main():
    from yolo_tpu import YOLO
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    OUT.mkdir(parents=True, exist_ok=True)
    ds_root = Path(os.getenv("DEMO_DS", "/tmp/ir_demo_ds"))
    data = make_dataset(ds_root, n_train=int(os.getenv("DEMO_TRAIN_IMAGES", "64")))

    # 1) train the P2 small-target model with the IR recipe (shortened).
    # DEMO_SKIP_TRAIN=1 reuses demos/artifacts/train/weights/best.npz and the
    # recorded metrics (clip-only rerun).
    if os.getenv("DEMO_SKIP_TRAIN") == "1" and (OUT / "train/weights/best.npz").exists():
        model = YOLO(str(OUT / "train/weights/best.npz"))
        prev = json.loads((OUT / "demo_report.json").read_text()) if (OUT / "demo_report.json").exists() else {}
        # no fabricated numbers: absent a recorded report, metrics stay empty
        # and the mAP assertion below is skipped for this clip-only rerun
        metrics = prev.get("train_metrics_heldout_val", {})
        train_time = prev.get("train_minutes", 0.0) * 60
    else:
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

    # 2) fused detect+track on a reference-scale occlusion clip (3612 frames,
    # periodic cloud cover → the reference demo's detected/predicted regime)
    det_model = model.model
    params = det_model.fuse(model.params)
    n_frames = max(int(os.getenv("DEMO_FRAMES", "3612")), 128)  # ≥1 fused chunk
    clip, occl = make_clip(n_frames)
    ft = FusedDetectTrack(det_model, params, frame_hw=(512, 640), channels=1, chunk=128,
                          conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    ft.process_chunk(clip[:128])  # compile
    ft.reset()  # clear both track state and the on-device stats accumulator
    n_used = (n_frames // 128) * 128
    t0 = time.time()
    outs, stats = ft.run_clip(clip[:n_used])
    fps = n_used / (time.time() - t0)

    # The track-level counters above follow the reference's accounting exactly
    # (every track contributes a detected/predicted frame each step, ref
    # kalman/aircraft_detection_tracking.py:111-131), so they can exceed the
    # frame count when false-positive tracks coast. The FRAME-level aggregate
    # below (any-track-detected per frame) is the human-readable view.
    st = np.concatenate([o["status"] for o in outs])  # (n_used, N)
    em = np.concatenate([o["emit"] for o in outs])
    det_f = (em & (st == 1)).any(axis=1)
    pred_f = ~det_f & (em & (st == 2)).any(axis=1)
    frame_state = np.where(det_f, 1, np.where(pred_f, 2, 0))
    nz = frame_state[frame_state > 0]
    frame_switches = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
    frame_level = {
        "detection_frames": int(det_f.sum()),
        "prediction_frames": int(pred_f.sum()),
        "state_changes": frame_switches,
    }

    # side-by-side with the reference's recorded demo clip (ref README.md:177-182)
    ref = {"frames": 3612, "detection_frames": 600, "prediction_frames": 3000, "state_changes": 119}
    report = {
        "train_metrics_heldout_val": metrics,
        "train_minutes": round(train_time / 60, 2),
        "clip_frames": n_used,
        "occlusion_pattern": occl,
        "track_stats": stats,
        "frame_level": frame_level,
        "reference_clip_stats": ref,
        "detected_pct": round(100 * frame_level["detection_frames"] / max(stats["frames"], 1), 1),
        "predicted_pct": round(100 * frame_level["prediction_frames"] / max(stats["frames"], 1), 1),
        "reference_detected_pct": 16.6,
        "reference_predicted_pct": 83.4,
        "detect_track_fps": round(fps, 1),
    }
    (OUT / "demo_report.json").write_text(json.dumps(report, indent=2, default=float))
    print(json.dumps(report, indent=2, default=float))
    if "mAP50" in metrics:  # absent only on a clip-only rerun with no recorded report
        assert metrics["mAP50"] > 0.5, "detector failed to generalize to the held-out val split"
    assert stats["detection_frames"] > 0 and stats["prediction_frames"] > 0, "tracking must coast the occlusions"
    assert max(stats["state_changes"], frame_level["state_changes"]) >= 20, f"occlusion-rich clip must exercise state switching, got {stats['state_changes']}"
    print("IR END-TO-END DEMO OK")


if __name__ == "__main__":
    main()
